package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewUtilSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join, with keys spread across salts") {
    val fact = (0 until 500).map(i => (i.toLong, if (i % 10 == 0) 1L else i.toLong % 7, s"r$i"))
      .toDF("row_id", "k", "v") // key 1 is hot
    val dim = Seq((0L, "d0"), (1L, "d1"), (2L, "d2"), (3L, "d3"),
      (4L, "d4"), (5L, "d5"), (6L, "d6")).toDF("k", "dv")
    val plain = fact.join(dim, "k").select("row_id", "k", "v", "dv")
    val salted = SkewUtil.saltedJoin(fact, dim, "k", tiebreaker = "row_id", salts = 8)
      .select("row_id", "k", "v", "dv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's rows actually spread over multiple salt values
    val spread = fact.filter($"k" === 1L)
      .withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(spread > 1)
  }

  test("salt is deterministic across recomputation (replay-stable)") {
    val fact = (0 until 100).map(i => (i.toLong, i.toLong % 3, "x")).toDF("row_id", "k", "v")
    val s1 = fact.withColumn("s", pmod(hash(col("row_id")), lit(4))).collect().toSeq
    val s2 = fact.withColumn("s", pmod(hash(col("row_id")), lit(4))).collect().toSeq
    assert(s1 == s2)
  }

  test("heavyKeys surfaces the hot key first") {
    val df = ((0 until 90).map(_ => 7L) ++ (10 until 20).map(_.toLong))
      .toDF("k")
    val top = SkewUtil.heavyKeys(df, col("k"), 3).collect()
    assert(top.head.getLong(0) == 7L && top.head.getLong(1) == 90L)
  }
}
