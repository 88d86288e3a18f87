package graft.spark

import graft.SparkSpec
import graft.cdc.{Changelog, ManifestStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed tables + storage-partitioned joins: `PARTITIONED BY
  * (bucket(N, key))` writes bucket-pure files, the scan reports
  * KeyGroupedPartitioning, and a keyed join between co-bucketed graft
  * tables plans with ZERO shuffle Exchange on either side.
  */
class GraftBucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_bkt_wh_").toString

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.gbk", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbk.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbk.db")
  }
  private def sql(q: String) = { cat; spark.sql(q) }

  private def store(tbl: String) = new ManifestStore(
    java.nio.file.Paths.get(warehouse, "db", tbl).toString, spark, "id")

  private def withSpj[T](body: => T): T = {
    val prev = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> spark.conf
        .getOption("spark.sql.sources.v2.bucketing.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf
        .getOption("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally prev.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None    => spark.conf.unset(k)
      }
    }
  }

  private def shuffles(df: DataFrame): Int =
    "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("bucketed writes produce bucket-pure files recorded in the manifest") {
    sql("DROP TABLE IF EXISTS gbk.db.b1")
    sql("CREATE TABLE gbk.db.b1 (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gbk.db.b1 SELECT id, CAST(id AS STRING) FROM range(0, 4000)")
    val m = store("b1").currentManifest.get
    assert(m.files.nonEmpty && m.files.forall(_.bucket.isDefined),
      s"every file must carry its bucket, got ${m.files.map(_.bucket)}")
    assert(m.files.map(_.bucket.get).toSet == Set(0, 1, 2, 3))
    // purity: re-deriving each file's buckets from its rows yields one value
    val root = store("b1").root
    val withB = spark.read.format("graft").load(root)
      .withColumn("_b", pmod(hash(col("id")), lit(4)))
    m.files.foreach { f =>
      val vals = spark.read.parquet(s"$root/files/${f.name}")
        .select(pmod(hash(col("id")), lit(4))).distinct().as[Int].collect()
      assert(vals.toSeq == Seq(f.bucket.get),
        s"file ${f.name} must be pure in bucket ${f.bucket.get}, got ${vals.toSeq}")
    }
    assert(withB.count() == 4000L)
  }

  test("co-bucketed keyed join plans with zero shuffle on either side") {
    sql("DROP TABLE IF EXISTS gbk.db.l")
    sql("DROP TABLE IF EXISTS gbk.db.r")
    sql("CREATE TABLE gbk.db.l (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(8, id)) TBLPROPERTIES ('key'='id')")
    sql("CREATE TABLE gbk.db.r (id BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(8, id)) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gbk.db.l SELECT id, CAST(id AS STRING) FROM range(0, 5000)")
    sql("INSERT INTO gbk.db.r SELECT id, CAST(id * 2 AS DOUBLE) " +
      "FROM range(0, 5000, 2)") // r holds the evens only
    withSpj {
      val j = sql("SELECT l.id, l.v, r.w FROM gbk.db.l l " +
        "JOIN gbk.db.r r ON l.id = r.id")
      assert(shuffles(j) == 0,
        s"expected a storage-partitioned join, got:\n${j.queryExecution.executedPlan}")
      assert(j.count() == 2500L)
      val s = j.agg(sum(col("w"))).head().getDouble(0)
      assert(s == (0L until 5000L by 2).map(_ * 2.0).sum)
    }
    // without the conf the join still answers (with exchanges)
    val j2 = sql("SELECT count(*) AS c FROM gbk.db.l l " +
      "JOIN gbk.db.r r ON l.id = r.id")
    assert(j2.as[Long].head() == 2500L)
  }

  test("bucketed layout survives upserts and deletes; join stays aligned") {
    sql("DROP TABLE IF EXISTS gbk.db.m")
    sql("CREATE TABLE gbk.db.m (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gbk.db.m SELECT id, 'a' FROM range(0, 1000)")
    sql("INSERT INTO gbk.db.m SELECT id, 'b' FROM range(500, 1500)") // upsert
    sql("DELETE FROM gbk.db.m WHERE id < 100")
    val m = store("m").currentManifest.get
    assert(m.files.forall(_.bucket.isDefined),
      "merge-rewritten and upsert files must stay bucketed")
    withSpj {
      val j = sql("SELECT count(*) AS c FROM gbk.db.m a JOIN gbk.db.m b " +
        "ON a.id = b.id")
      assert(shuffles(j) == 0,
        s"self-join must stay exchange-free:\n${j.queryExecution.executedPlan}")
      assert(j.as[Long].head() == 1400L)
    }
    assert(sql("SELECT count(*) AS c FROM gbk.db.m WHERE v = 'b'")
      .as[Long].head() == 1000L)
  }

  test("the catalog bucket function matches the writer's assignment") {
    val f = GraftBucketFunction.unbound.bind(
      org.apache.spark.sql.types.StructType.fromDDL("n INT, k BIGINT"))
      .asInstanceOf[GraftBucketFunction.Bound]
    val viaSpark = spark.range(0, 1000)
      .select(col("id"), pmod(hash(col("id")), lit(8)).as("b"))
      .as[(Long, Int)].collect()
    viaSpark.foreach { case (id, b) =>
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](8, id))
      assert(f.produceResult(row) == b, s"function/writer disagree at $id")
    }
  }

  test("unbucketed vintage files veto partition reporting, reads stay correct") {
    // a store committed BEFORE buckets=N was set: files carry no bucket,
    // the scan must fall back to per-file partitions (no KeyGrouped claim)
    val root = java.nio.file.Files.createTempDirectory("bkt_vintage").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 100L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 4)
    ManifestStore.writeTableProps(root, Map("buckets" -> "4"))
    val t = spark.read.format("graft").load(root)
    assert(t.count() == 100L)
    // next commit re-buckets; mixed manifests still read correctly
    val st2 = new ManifestStore(root, spark, "id")
    val net = (100L until 200L).map(i =>
      (i.toString, "u", i, s"n$i", 1L))
      .toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name",
        Changelog.TsCol)
    st2.merge(net, Seq("id", "name"), batchId = 1)
    assert(spark.read.format("graft").load(root).count() == 200L)
  }
}
