package graft.cdc

import graft.SparkSpec
import java.nio.file.Files

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store() =
    new SnapshotStore(Files.createTempDirectory("snap").toString, spark)

  test("commit writes a version and read returns it") {
    val st = store()
    assert(!st.exists && st.read().isEmpty)
    assert(st.commit(Seq((1L, "a")).toDF("id", "v"), batchId = 0))
    assert(st.current.contains((0L, 0L)))
    assert(st.read().get.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("replaying an already-committed batch is a no-op (exactly-once)") {
    val st = store()
    assert(st.commit(Seq((1L, "a")).toDF("id", "v"), batchId = 7))
    assert(!st.commit(Seq((2L, "b")).toDF("id", "v"), batchId = 7))
    assert(!st.commit(Seq((2L, "b")).toDF("id", "v"), batchId = 3))
    assert(st.read().get.collect().map(_.getString(1)).toSeq == Seq("a"))
  }

  test("versions advance and the previous version survives the swap") {
    val st = store()
    st.commit(Seq((1L, "a")).toDF("id", "v"), 0)
    st.commit(Seq((1L, "b")).toDF("id", "v"), 1)
    st.commit(Seq((1L, "c")).toDF("id", "v"), 2)
    assert(st.current.contains((2L, 2L)))
    assert(st.read().get.collect().map(_.getString(1)).toSeq == Seq("c"))
    // v_1 retained for in-flight readers of the pre-swap manifest
    assert(Files.exists(java.nio.file.Paths.get(st.root, "v_2")))
    assert(Files.exists(java.nio.file.Paths.get(st.root, "v_1")))
  }

  private def parquetFiles(st: SnapshotStore, v: Long): Long = {
    val s = Files.list(java.nio.file.Paths.get(st.root, s"v_$v"))
    try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  test("compact merges small files, preserves content and batch idempotence") {
    val st = store()
    val df = (0L until 200L).map(i => (i, s"r$i")).toDF("id", "v")
    st.commit(df.repartition(8), batchId = 5)
    assert(parquetFiles(st, 0) == 8)
    val newV = st.compact() // 200 tiny rows -> far below target -> 1 file
    assert(newV.contains(1L))
    assert(parquetFiles(st, 1) == 1)
    // identical content, same manifest batchId: replay stays a no-op
    assert(st.read().get.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    assert(st.current.contains((1L, 5L)))
    assert(!st.commit(df, batchId = 5))
    // already compact -> no pointless rewrite
    assert(st.compact().isEmpty)
  }

  test("z-order compaction clusters files: no file spans both full ranges") {
    val rnd = new scala.util.Random(9)
    val df = (0 until 8000).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextDouble() * 100.0))
      .toDF("id", "k", "v")
    val st = store()
    st.commit(df.repartition(4), batchId = 0)
    // force a multi-file clustered rewrite regardless of tiny input size
    val newV = st.compact(targetBytes = 40 * 1024, zorderBy = Some(("k", "v", 8)))
    assert(newV.contains(1L))
    // content lossless
    assert(st.read().get.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet == df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    // per-file boxes: after clustering, NO file's box may cover 90%+ of
    // BOTH dimensions (pre-compaction random files all do)
    import org.apache.spark.sql.functions._
    val boxes = st.read().get
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("mnk"), max("k").as("mxk"),
        min("v").as("mnv"), max("v").as("mxv"))
      .collect()
    assert(boxes.length > 1, "clustered rewrite produced a single file")
    val wideBoth = boxes.count { r =>
      (r.getLong(2) - r.getLong(1)) > 900L && (r.getDouble(4) - r.getDouble(3)) > 90.0
    }
    assert(wideBoth == 0, s"$wideBoth of ${boxes.length} files are unclustered")
  }
}
