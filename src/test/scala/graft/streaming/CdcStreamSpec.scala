package graft.streaming

import graft.SparkSpec
import graft.cdc._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  val fields = Seq(
    Envelope.FieldInfo("id", "int64", optional = false),
    Envelope.FieldInfo("name", "string"))

  private def event(op: String, id: Long, name: String, ts: Long): String = {
    val img = s"""{"id":$id,"name":"$name"}"""
    val before = if (op == "u" || op == "d") img else "null"
    val after = if (op == "d") "null" else img
    s"""{"schema":${Envelope.schemaBlockJson(fields)},"payload":{"before":$before,"after":$after,"source":{"connector":"postgresql","table":"t","ts_ms":$ts},"op":"$op","ts_ms":$ts,"transaction":null}}"""
  }

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("memory-stream end to end: batches merge into the snapshot store") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[String]
    val store = new SnapshotStore(tmp("st"), spark)
    val stream = new CdcStream(spark, ms.toDF(), store, "id",
      cacheDir = tmp("cache"), checkpointDir = tmp("ckpt"),
      trigger = Trigger.ProcessingTime(0))
    val q = stream.start()
    try {
      ms.addData(event("c", 1, "a", 100), event("c", 2, "b", 100))
      q.processAllAvailable()
      assert(store.read().get.select("id", "name").collect().toSet ==
        Set(org.apache.spark.sql.Row(1L, "a"), org.apache.spark.sql.Row(2L, "b")))

      // second batch: update 1, delete 2, stale update of 1 must not regress
      ms.addData(event("u", 1, "a2", 200), event("d", 2, "b", 150),
        event("u", 1, "stale", 50))
      q.processAllAvailable()
      val rows = store.read().get.select("id", "name").collect().toSet
      assert(rows == Set(org.apache.spark.sql.Row(1L, "a2")))
    } finally stream.stopGracefully(q)
  }

  test("file source end to end with AvailableNow trigger") {
    val inDir = tmp("in")
    Files.writeString(java.nio.file.Paths.get(inDir, "b0.json"),
      Seq(event("c", 10, "x", 100), event("u", 10, "y", 200)).mkString("\n"))
    val store = new SnapshotStore(tmp("st"), spark)
    val stream = new CdcStream(spark, CdcStream.fileSource(spark, inDir),
      store, "id", cacheDir = tmp("cache"), checkpointDir = tmp("ckpt"))
    val q = stream.start()
    q.awaitTermination(60000)
    assert(store.read().get.select("name").as[String].collect().toSeq == Seq("y"))
  }

  test("schema cache survives restart: second stream skips inference") {
    val cacheDir = tmp("cache")
    Envelope.saveCache(cacheDir, fields)
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[String]
    val store = new SnapshotStore(tmp("st"), spark)
    val stream = new CdcStream(spark, ms.toDF(), store, "id",
      cacheDir = cacheDir, checkpointDir = tmp("ckpt"),
      trigger = Trigger.ProcessingTime(0))
    val q = stream.start()
    try {
      // an event with NO schema block — inference would throw, cache must win
      val noSchema = event("c", 5, "cached", 100).replaceFirst(
        """\{"schema":.*?,"payload"""", """{"payload"""")
      ms.addData(noSchema)
      q.processAllAvailable()
      assert(store.read().get.select("name").as[String].collect().toSeq == Seq("cached"))
    } finally stream.stopGracefully(q)
  }

  test("replaying a batch id is a no-op (foreachBatch replay safety)") {
    val store = new SnapshotStore(tmp("st"), spark)
    val stream = new CdcStream(spark, spark.emptyDataFrame, store, "id",
      cacheDir = tmp("cache"), checkpointDir = tmp("ckpt"))
    val b1 = Seq((event("c", 1, "a", 100), 0L)).toDF("value", Changelog.SeqCol)
    stream.processBatch(b1, 0)
    val v1 = store.current
    // same batch id again with different payload: must not apply
    val b2 = Seq((event("u", 1, "clobber", 900), 1L)).toDF("value", Changelog.SeqCol)
    stream.processBatch(b2, 0)
    assert(store.current == v1)
    assert(store.read().get.select("name").as[String].collect().toSeq == Seq("a"))
  }

  test("maintained agg view tracks the snapshot across batches, replays, " +
      "and the crash-window rebuild") {
    val numFields = Seq(
      Envelope.FieldInfo("id", "int64", optional = false),
      Envelope.FieldInfo("grp", "string"),
      Envelope.FieldInfo("v", "double"))
    def nEvent(op: String, id: Long, grp: String, v: Double, ts: Long): String = {
      val img = s"""{"id":$id,"grp":"$grp","v":$v}"""
      val before = if (op == "u" || op == "d") img else "null"
      val after = if (op == "d") "null" else img
      s"""{"schema":${Envelope.schemaBlockJson(numFields)},"payload":{"before":$before,"after":$after,"source":{"connector":"postgresql","table":"t","ts_ms":$ts},"op":"$op","ts_ms":$ts,"transaction":null}}"""
    }
    val store = new SnapshotStore(tmp("st"), spark)
    val view = new SnapshotStore(tmp("vw"), spark)
    val stream = new CdcStream(spark, spark.emptyDataFrame, store, "id",
      cacheDir = tmp("cache"), checkpointDir = tmp("ckpt"),
      aggView = Some((view, "grp", "v")))
    def viewSet() = view.read().get
      .select(org.apache.spark.sql.functions.col("grp"),
        org.apache.spark.sql.functions.col("cnt"),
        org.apache.spark.sql.functions.col("sum_val").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    def recompute() = IncrementalAgg.aggState(store.read().get, "grp", "v")
      .select(org.apache.spark.sql.functions.col("grp"),
        org.apache.spark.sql.functions.col("cnt"),
        org.apache.spark.sql.functions.col("sum_val").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    stream.processBatch(Seq(
      (nEvent("c", 1, "a", 10.5, 100), 0L), (nEvent("c", 2, "a", 2.0, 100), 1L),
      (nEvent("c", 3, "b", 7.0, 100), 2L)).toDF("value", Changelog.SeqCol), 0)
    assert(viewSet() == Set(("a", 2L, 12.5), ("b", 1L, 7.0)))
    assert(viewSet() == recompute())

    // update migrates a group, delete empties one — folded in O(delta)
    stream.processBatch(Seq(
      (nEvent("u", 2, "b", 4.0, 200), 0L), (nEvent("d", 3, "b", 7.0, 200), 1L))
      .toDF("value", Changelog.SeqCol), 1)
    assert(viewSet() == Set(("a", 1L, 10.5), ("b", 1L, 4.0)))
    assert(viewSet() == recompute())

    // replay of an applied batch: main store no-ops, view must too
    stream.processBatch(Seq(
      (nEvent("u", 1, "z", 999.0, 900), 0L)).toDF("value", Changelog.SeqCol), 1)
    assert(viewSet() == Set(("a", 1L, 10.5), ("b", 1L, 4.0)))

    // crash window: the view missed a batch (simulated by wiping it); the
    // NEXT committed batch detects the lag and rebuilds, then folds
    val view2 = new SnapshotStore(tmp("vw2"), spark)
    val stream2 = new CdcStream(spark, spark.emptyDataFrame, store, "id",
      cacheDir = tmp("cache2"), checkpointDir = tmp("ckpt2"),
      aggView = Some((view2, "grp", "v")))
    stream2.processBatch(Seq(
      (nEvent("c", 4, "c", 1.25, 300), 0L)).toDF("value", Changelog.SeqCol), 5)
    val got = view2.read().get
      .select(org.apache.spark.sql.functions.col("grp"),
        org.apache.spark.sql.functions.col("cnt"),
        org.apache.spark.sql.functions.col("sum_val").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 1L, 10.5), ("b", 1L, 4.0), ("c", 1L, 1.25)))
  }

  test("schema drift: a new source column appears mid-stream and the snapshot grows it") {
    val store = new SnapshotStore(tmp("st"), spark)
    val stream = new CdcStream(spark, spark.emptyDataFrame, store, "id",
      cacheDir = tmp("cache"), checkpointDir = tmp("ckpt"))
    stream.processBatch(
      Seq((event("c", 1, "a", 100), 0L)).toDF("value", Changelog.SeqCol), 0)
    assert(store.read().get.columns.toSeq == Seq("id", "name", Merge.LastTsCol))

    // batch 2: events now carry an extra `age` column (source DDL change)
    val evolvedFields = fields :+ Envelope.FieldInfo("age", "int32")
    val ev2 =
      s"""{"schema":${Envelope.schemaBlockJson(evolvedFields)},"payload":{"before":null,"after":{"id":2,"name":"b","age":7},"source":{"connector":"postgresql","table":"t","ts_ms":200},"op":"c","ts_ms":200,"transaction":null}}"""
    stream.processBatch(Seq((ev2, 0L)).toDF("value", Changelog.SeqCol), 1)
    val snap = store.read().get
    assert(snap.columns.contains("age"))
    val rows = snap.select("id", "name", "age").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    assert(rows == Set((1L, "a", -1), (2L, "b", 7))) // old row: null age
  }

  test("sql audit side output records replay statements per batch") {
    val store = new SnapshotStore(tmp("st"), spark)
    val auditDir = tmp("audit")
    val stream = new CdcStream(spark, spark.emptyDataFrame, store, "id",
      cacheDir = tmp("cache"), checkpointDir = tmp("ckpt"),
      sqlAuditDir = Some(auditDir), auditTable = "t")
    stream.processBatch(
      Seq((event("c", 1, "a", 100), 0L), (event("d", 1, "a", 200), 1L))
        .toDF("value", Changelog.SeqCol), 0)
    val lines = spark.read.text(s"$auditDir/batch_0")
      .collect().map(_.getString(0)).sorted
    assert(lines.length == 2) // pre-dedup: both events logged
    assert(lines.exists(_.startsWith("INSERT INTO t")))
    assert(lines.contains("DELETE FROM t WHERE id = 1;"))
  }

  test("crash between sink and checkpoint commit: restart replays the batch " +
      "and the snapshot converges (at-least-once + idempotent merge)") {
    val inDir = tmp("in"); val ckpt = tmp("ckpt"); val cache = tmp("cache")
    val store = new SnapshotStore(tmp("st"), spark)
    // two files + maxFilesPerTrigger=1 -> two deterministic micro-batches,
    // the replayed unit being a recorded file set exactly as a Kafka replay
    // is a recorded offset range
    val f0 = java.nio.file.Paths.get(inDir, "b0.json")
    val f1 = java.nio.file.Paths.get(inDir, "b1.json")
    Files.writeString(f0,
      Seq(event("c", 1, "a", 100), event("c", 2, "b", 100)).mkString("\n"))
    Files.writeString(f1,
      Seq(event("u", 1, "a2", 200), event("d", 2, "b", 200)).mkString("\n"))
    // the file source orders batches by modification time — pin distinct
    // times or both files land in an arbitrary order
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(now - 60000))
    Files.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(now))
    def run(): Unit = {
      val s = new CdcStream(spark, CdcStream.fileSource(spark, inDir, Some(1)),
        store, "id", cacheDir = cache, checkpointDir = ckpt)
      val q = s.start()
      q.awaitTermination(60000)
      q.stop()
      // the next restart may not begin until this run fully deregisters
      // from the shared session's active-query registry
      while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
    }
    run()
    val v1 = store.current
    val expected = store.read().get.select("id", "name").collect().toSet
    assert(expected == Set(org.apache.spark.sql.Row(1L, "a2")))

    // the crash window: the batch reached the store but the checkpoint lost
    // its commit record -> on restart Spark re-delivers the SAME batch id
    // with the SAME file set (at-least-once)
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    val latest = commits.maxBy(_.getName.toInt)
    // the checksum FS keeps a .N.crc sidecar; leaving it behind makes the
    // replay's commit rename collide
    new java.io.File(latest.getParentFile, s".${latest.getName}.crc").delete()
    assert(latest.delete())
    run()
    // the replay must be a no-op: same snapshot version, same rows
    assert(store.current == v1)
    assert(store.read().get.select("id", "name").collect().toSet == expected)

    // a clean restart (checkpoint intact) processes nothing new either
    run()
    assert(store.current == v1)
  }

  test("columnsToSave prunes the materialized table but keeps the key") {
    val store = new SnapshotStore(tmp("st"), spark)
    val stream = new CdcStream(spark, spark.emptyDataFrame, store, "id",
      cacheDir = tmp("cache"), checkpointDir = tmp("ckpt"),
      columnsToSave = Some(Seq("name")))
    stream.processBatch(
      Seq((event("c", 1, "a", 100), 0L)).toDF("value", Changelog.SeqCol), 0)
    assert(store.read().get.columns.toSeq == Seq("id", "name", Merge.LastTsCol))
  }
}
