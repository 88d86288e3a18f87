package graft.spark

import graft.SparkSpec
import graft.cdc.ManifestStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The native streaming sink ([[GraftStreamingWrite]]): multi-epoch keyed
  * upserts, exactly-once under epoch replay, restart from checkpoint, and
  * Complete-mode recommits.
  */
class GraftStreamingSinkSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sink_$tag").toString

  test("initial-snapshot epoch promotes: staged files adopted, clustered") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("pr") + "/store"
    val ck = tmp("prck")
    val ms = MemoryStream[(Long, String)]
    val before = ManifestStore.adoptedFiles.get()
    val q = ms.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("key", "id").option("files", "4")
      .option("checkpointLocation", ck)
      .start(root)
    try {
      // shuffled input: disjoint per-file key ranges can then only come
      // from the write's required (range) distribution being applied
      ms.addData(new scala.util.Random(42L)
        .shuffle((0L until 400L).toVector).map(i => (i, s"n$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(ManifestStore.adoptedFiles.get() > before,
      "the initial snapshot epoch must adopt its staged files (1x write)")
    val m = new ManifestStore(root, spark, "id").currentManifest.get
    assert(m.files.size > 1)
    // the required ordering reached the micro-batch write: adopted files
    // hold disjoint, range-clustered keys exactly like the rewriting path
    val ranges = m.files.map(f => (f.minKey.toLong, f.maxKey.toLong))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"adopted snapshot files overlap: $ranges")
      case _ =>
    }
    assert(spark.read.format("graft").load(root).count() === 400L)
    // later epochs MERGE (no promotion) and stay correct
    val q2 = ms.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("key", "id").option("checkpointLocation", ck)
      .start(root)
    try {
      ms.addData((0L, "updated"), (400L, "new"))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.format("graft").load(root)
    assert(rows.count() === 401L)
    assert(rows.filter(col("id") === 0L).select("v").head().getString(0)
      === "updated")
  }

  test("Complete-mode epochs promote: each recommit adopts staged files") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("prc") + "/store"
    val ck = tmp("prcck")
    val ms = MemoryStream[(Long, Long)]
    val before = ManifestStore.adoptedFiles.get()
    val q = ms.toDF().toDF("k", "n")
      .groupBy(col("k")).agg(sum("n").as("total"))
      .writeStream.format("graft").outputMode("complete")
      .option("key", "k").option("checkpointLocation", ck)
      .start(root)
    try {
      ms.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      ms.addData((1L, 5L), (3L, 7L))
      q.processAllAvailable()
    } finally q.stop()
    assert(ManifestStore.adoptedFiles.get() > before,
      "Complete-mode recommits must adopt their staged files")
    val got = spark.read.format("graft").load(root)
      .select("k", "total").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 15L, 2L -> 20L, 3L -> 7L))
  }

  test("multi-epoch upsert; restart from checkpoint continues the lineage") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("u") + "/store"
    val ck = tmp("uck")
    val ms = MemoryStream[(Long, String)]
    def start() = ms.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("key", "id").option("checkpointLocation", ck)
      .start(root)

    val q = start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.read.format("graft").load(root).count() === 2)
      ms.addData((2L, "B"), (3L, "c"))
      q.processAllAvailable()
      val rows = spark.read.format("graft").load(root)
        .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows === Map(1L -> "a", 2L -> "B", 3L -> "c"))
    } finally q.stop()

    // restart against the same checkpoint: the query id (stream lineage)
    // survives, new data lands as the next epochs
    val q2 = start()
    try {
      ms.addData((4L, "d"))
      q2.processAllAvailable()
      assert(spark.read.format("graft").load(root).count() === 4)
    } finally q2.stop()

    // the store carries the sink's lineage for the replay guard
    val st = new ManifestStore(root, spark, "id")
    val (_, batchId, streamId) = st.current.get
    assert(streamId.nonEmpty && batchId >= 1L)
  }

  test("a restarted query with a WIDER schema evolves the table additively") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("ev") + "/store"
    val ms1 = MemoryStream[(Long, String)]
    val q1 = ms1.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("key", "id").option("checkpointLocation", tmp("evck1"))
      .start(root)
    try {
      ms1.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    // a NEW query (fresh checkpoint — Spark fixes a query's schema for
    // its lifetime) writes the evolved, wider shape: the upsert merge's
    // additive-drift path widens the table; pre-drift rows read NULL
    val ms2 = MemoryStream[(Long, String, Double)]
    val q2 = ms2.toDF().toDF("id", "v", "score")
      .writeStream.format("graft")
      .option("key", "id").option("checkpointLocation", tmp("evck2"))
      .start(root)
    try {
      ms2.addData((2L, "B", 2.5), (3L, "c", 3.5))
      q2.processAllAvailable()
    } finally q2.stop()
    val t = spark.read.format("graft").load(root)
    assert(t.columns.contains("score"), t.columns.mkString(","))
    val rows = t.select("id", "v", "score").collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))).toMap
    assert(rows === Map(1L -> (("a", null)), 2L -> (("B", 2.5)),
      3L -> (("c", 3.5))), rows.toString)
  }

  test("epoch replay is a no-op: re-committing an applied epoch changes nothing") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("r") + "/store"
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("key", "id").option("checkpointLocation", tmp("rck"))
      .start(root)
    try {
      ms.addData((1L, "a")); q.processAllAvailable()
      ms.addData((2L, "b")); q.processAllAvailable()
    } finally q.stop()
    val st = new ManifestStore(root, spark, "id")
    val (verBefore, batchBefore, lineage) = st.current.get
    // simulate a crash-in-commit redelivery: merge an already-applied
    // epoch under the sink's lineage — the guard must swallow it
    val net = Seq(("1", "u", 99L, 1L, "REPLAYED")).toDF(
      "key_value", "operation", "timestamp", "after_id", "after_v")
    val out = st.mergeOptimistic(net, Seq("id", "v"),
      batchId = batchBefore, streamId = lineage, tsGuard = false)
    assert(out === ManifestStore.AlreadyMerged)
    assert(st.current.get._1 === verBefore)
    assert(spark.read.format("graft").load(root)
      .filter(col("id") === 1L).select("v").head().getString(0) === "a")
  }

  test("'mor' option: scattered epochs mask via sidecars, files carried") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("m") + "/store"
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("key", "id").option("mor", "true").option("files", "4")
      .option("checkpointLocation", tmp("mck"))
      .start(root)
    try {
      // epoch 0: snapshot across 4 files
      ms.addData((0L until 4000L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
      val st = new ManifestStore(root, spark, "id")
      val before = st.currentManifest.get.files.map(_.name).toSet
      assert(before.size >= 2)
      // epoch 1: one key inside every file's range — CoW would rewrite all
      ms.addData((10L, "HIT"), (1010L, "HIT"), (2010L, "HIT"), (3010L, "HIT"))
      q.processAllAvailable()
      val after = st.currentManifest.get
      assert(before.subsetOf(after.files.map(_.name).toSet),
        "mor sink must not rewrite data files")
      assert(after.files.exists(_.dv.isDefined))
      val df = spark.read.format("graft").load(root)
      assert(df.count() === 4000)
      assert(df.filter(col("v") === "HIT").count() === 4)
    } finally q.stop()
  }

  test("tsguard: a late epoch's stale event cannot regress the stored row") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("g") + "/store"
    val ms = MemoryStream[(Long, String, Long)]
    val q = ms.toDF().toDF("id", "v", "last_ts")
      .writeStream.format("graft")
      .option("key", "id").option("tsguard", "true")
      .option("checkpointLocation", tmp("gck"))
      .start(root)
    try {
      ms.addData((1L, "seed", 1L), (2L, "seed", 1L))
      q.processAllAvailable()
      ms.addData((1L, "fresh", 100L))
      q.processAllAvailable()
      // a LATE event for key 1 with an older ts arrives in a later epoch:
      // the guard must keep 'fresh'; key 2's newer event still applies
      ms.addData((1L, "stale", 50L), (2L, "newer", 60L))
      q.processAllAvailable()
      val rows = spark.read.format("graft").load(root)
        .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows === Map(1L -> "fresh", 2L -> "newer"))
    } finally q.stop()
  }

  test("opcol: a changelog stream's deletes delete — declarative CDC pipeline") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("o") + "/store"
    // (id, v, op, ts): the shape Changelog transforms produce from a raw
    // Debezium stream — key + after-image + operation + event time
    val ms = MemoryStream[(Long, String, String, Long)]
    val q = ms.toDF().toDF("id", "v", "op", "last_ts")
      .writeStream.format("graft")
      .option("key", "id").option("opcol", "op").option("tsguard", "true")
      .option("checkpointLocation", tmp("ock"))
      .start(root)
    try {
      ms.addData((1L, "a", "c", 1L), (2L, "b", "c", 1L), (3L, "c", "c", 1L))
      q.processAllAvailable()
      // epoch 2: update 1, delete 2, insert 4 — one changelog batch
      ms.addData((1L, "A", "u", 10L), (2L, null, "d", 10L), (4L, "d4", "c", 10L))
      q.processAllAvailable()
      val rows = spark.read.format("graft").load(root)
        .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows === Map(1L -> "A", 3L -> "c", 4L -> "d4"))
      // a stale delete for key 1 (older ts) must NOT remove the fresh row
      ms.addData((1L, null, "d", 5L))
      q.processAllAvailable()
      assert(spark.read.format("graft").load(root)
        .filter(col("id") === 1L).count() === 1L)
    } finally q.stop()
  }

  test("Complete mode recommits the full aggregate each epoch") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("c") + "/store"
    val ms = MemoryStream[String]
    val q = ms.toDF().toDF("word")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .writeStream.format("graft").outputMode("complete")
      .option("key", "word").option("checkpointLocation", tmp("cck"))
      .start(root)
    try {
      ms.addData("x", "y", "x")
      q.processAllAvailable()
      val r1 = spark.read.format("graft").load(root)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r1 === Map("x" -> 2L, "y" -> 1L))
      ms.addData("y", "z")
      q.processAllAvailable()
      val r2 = spark.read.format("graft").load(root)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r2 === Map("x" -> 2L, "y" -> 2L, "z" -> 1L))
    } finally q.stop()
  }

  test("BUCKETED initial snapshot promotes: bucket-pure adopted files, SPJ-ready") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("bkt") + "/store"
    val ck = tmp("bktck")
    val n = 4
    ManifestStore.writeTableProps(root,
      Map("buckets" -> n.toString, "bloomfilter" -> "8192"))
    val ms = MemoryStream[(Long, String)]
    val before = ManifestStore.adoptedFiles.get()
    val q = ms.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("key", "id")
      .option("checkpointLocation", ck)
      .start(root)
    try {
      ms.addData(new scala.util.Random(7L)
        .shuffle((0L until 400L).toVector).map(i => (i, s"n$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(ManifestStore.adoptedFiles.get() > before,
      "the bucketed snapshot epoch must adopt its staged files (1x write)")
    val m = new ManifestStore(root, spark, "id").currentManifest.get
    // every adopted file carries its bucket id and is bucket-PURE under
    // the store's own hash (the storage-partitioned-join invariant)
    assert(m.files.forall(_.bucket.isDefined))
    assert(m.files.forall(_.bloom.isDefined), "key blooms fold too")
    m.files.foreach { f =>
      val got = spark.read.parquet(s"$root/files/${f.name}")
        .select(pmod(hash(col("id")), lit(n)).as("b"))
        .distinct().as[Int].collect().toSeq
      assert(got == Seq(f.bucket.get),
        s"file ${f.name} mixes buckets: $got vs ${f.bucket}")
    }
    // the scan reports KeyGroupedPartitioning over the adopted layout
    val df = spark.read.format("graft").load(root)
    df.collect()
    val parts = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions
    }.get
    assert(parts.forall(_.isInstanceOf[GraftBucketedPartition]),
      "adopted bucketed layout must plan as bucket partitions")
    assert(parts.size == n)
    assert(df.count() === 400L)
    // a later keyed upsert keeps the layout mergeable and correct
    val q2 = ms.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("key", "id").option("checkpointLocation", ck)
      .start(root)
    try { ms.addData((0L, "UPD")); q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.format("graft").load(root)
      .filter(col("id") === 0L).select("v").as[String].head() == "UPD")
  }

  test("autocompact.files bounds ingest file counts across epochs; data intact") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val epochs = 40
    // one run per leg: identical 40-epoch disjoint-key MoR ingest, the
    // only difference the opt-in table property
    def run(bound: Option[Int]): (Int, Long, String) = {
      val tag = if (bound.isDefined) "ac" else "nac"
      val root = tmp(tag) + "/store"
      val ck = tmp(tag + "ck")
      bound.foreach(b => ManifestStore.writeTableProps(root,
        Map("autocompact.files" -> b.toString,
          "retention.versions" -> "3")))
      val ms = MemoryStream[(Long, String)]
      val q = ms.toDF().toDF("id", "v")
        .writeStream.format("graft")
        .option("key", "id").option("mor", "true")
        .option("checkpointLocation", ck)
        .start(root)
      try {
        (0 until epochs).foreach { e =>
          ms.addData((0L until 5L).map(i => (e * 5L + i, s"v$e-$i")): _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      assert(GraftMaintenance.drain(), "maintenance pool did not drain")
      val m = new ManifestStore(root, spark, "id").currentManifest.get
      (m.files.size, spark.read.format("graft").load(root).count(), root)
    }
    val (unbounded, n1, _) = run(None)
    val before = GraftMaintenance.compactions.get()
    val (boundedFiles, n2, acRoot) = run(Some(6))
    // correctness first: both legs hold every ingested row
    assert(n1 === epochs * 5L)
    assert(n2 === epochs * 5L)
    val got = spark.read.format("graft").load(acRoot)
      .filter(col("id") === 123L).select("v").as[String].head()
    assert(got == "v24-3", s"compacted store corrupted a row: $got")
    // without the property the per-epoch files accrete unboundedly
    assert(unbounded > 12,
      s"fixture too weak: unbounded leg only reached $unbounded files")
    // with it, the async passes ran and the final layout sits at/under
    // the bound (the post-final-epoch probe settles any overshoot)
    assert(GraftMaintenance.compactions.get() > before,
      "no auto-compaction pass ran with autocompact.files set")
    assert(boundedFiles <= 6,
      s"autocompact leg ended at $boundedFiles files (bound 6, " +
        s"unbounded leg: $unbounded)")
    // retention.versions=3 ran vacuum in the same maintenance window:
    // the earliest versions' manifests are reaped on the bounded leg
    val acStore = new ManifestStore(acRoot, spark, "id")
    assert(acStore.manifest(0L).isEmpty,
      "retention.versions must reap versions below the keep window")
    assert(acStore.manifest(acStore.current.get._1).isDefined)
  }
}
