package graft

import graft.cdc._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Head-to-head commit-I/O measurement: [[graft.cdc.ManifestStore]]'s
  * stats-pruned MERGE vs the whole-table rewrite a
  * [[graft.cdc.SnapshotStore]] commit performs, on the same table and the
  * same micro-batch. This is the number the manifest store exists for —
  * at 100 TB the whole-table path is hours of I/O per trigger, the pruned
  * path is proportional to the touched key ranges.
  *
  * Usage: `sbt "runMain graft.MergeBench [nRows] [batchSize] [rounds]"`.
  * Deterministic content (range + column arithmetic, no randomness);
  * results print as one JSON line per round plus a summary line.
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val batch = args.lift(1).map(_.toLong).getOrElse(2000L)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val nFiles = 64
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("mergebench")
    val fields = Seq("id", "name", "val", "payload")

    // ~256 B/row payload: without it the whole-table path is measuring
    // job overhead, not I/O — the thing that actually scales with size
    val table = spark.range(n).select(col("id"),
      concat(lit("name_"), col("id")).as("name"),
      (col("id") % 997).cast("double").as("val"),
      repeat(md5(col("id").cast("string")), 8).as("payload"))

    val ms = new ManifestStore(s"$base/manifest", spark, "id")
    ms.commit(table, batchId = 0, nFiles = nFiles)
    val ss = new SnapshotStore(s"$base/snapshot", spark)
    ss.commit(table.repartition(nFiles), batchId = 0)

    /** `batch` updates confined to one narrow key range per round (round r
      * targets file ~r): the locality a CDC micro-batch actually has.
      */
    def netFor(round: Int): DataFrame = {
      val span = n / nFiles
      val lo = span * round
      spark.range(batch).select(
        (col("id") + lo).as(Changelog.KeyCol),
        lit("u").as(Changelog.OpCol),
        (col("id") + lo).as("after_id"),
        concat(lit(s"upd${round}_"), col("id")).as("after_name"),
        (col("id") % 31).cast("double").as("after_val"),
        repeat(md5(concat(lit("u"), col("id").cast("string"))), 8)
          .as("after_payload"),
        lit(1000L + round).as(Changelog.TsCol))
    }

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    var mSum = 0.0; var sSum = 0.0
    (1 to rounds).foreach { r =>
      val net = netFor(r)
      val (stats, mSec) = time(ms.merge(net, fields, batchId = r).get)
      // the CdcStream/SnapshotStore path: read current, merge, rewrite ALL
      val (_, sSec) = time {
        val snap = ss.read().get
        val (merged, cleanup) =
          Merge.applyChangesWithCleanup(snap, net, "id", fields)
        try ss.commit(merged.repartition(nFiles), batchId = r)
        finally cleanup()
      }
      mSum += mSec; sSum += sSec
      println(s"""{"round":$r,"manifest_sec":${f"$mSec%.2f"},"snapshot_sec":${f"$sSec%.2f"},"rewritten":${stats.rewrittenFiles},"reused":${stats.reusedFiles},"new":${stats.newFiles}}""")
    }
    println(s"""{"metric":"merge_bench","rows":$n,"batch":$batch,"files":$nFiles,"rounds":$rounds,"manifest_total_sec":${f"$mSum%.2f"},"snapshot_total_sec":${f"$sSum%.2f"},"speedup":${f"${sSum / mSum}%.1f"}}""")

    // OPTIMIZE vs full recluster: leave a few small growth files beyond the
    // key range (insert-only batches), then measure partial compaction —
    // cost must track the DIRT (a few thousand rows), while the full
    // rewrite tracks the TABLE (n rows), however large n grows
    (1 to 3).foreach { i =>
      val ins = spark.range(batch).select(
        (col("id") + n + batch * (i - 1)).as(Changelog.KeyCol),
        lit("c").as(Changelog.OpCol),
        (col("id") + n + batch * (i - 1)).as("after_id"),
        concat(lit(s"ins${i}_"), col("id")).as("after_name"),
        lit(1.0).as("after_val"),
        repeat(md5(concat(lit("i"), col("id").cast("string"))), 8)
          .as("after_payload"),
        lit(2000L + i).as(Changelog.TsCol))
      ms.merge(ins, fields, batchId = rounds + i).get
    }
    val (oStats, oSec) = time(ms.optimize(nFiles).get)
    val (_, rSec) = time(ms.recluster(nFiles).get)
    println(s"""{"metric":"optimize_bench","optimize_sec":${f"$oSec%.2f"},"recluster_sec":${f"$rSec%.2f"},"compacted":${oStats.compactedFiles},"carried":${oStats.carriedFiles},"new":${oStats.newFiles},"speedup":${f"${rSec / oSec}%.1f"}}""")

    // write amplification on the WORST case for copy-on-write: a small
    // batch SCATTERED over every file (one key per ~stride). CoW rewrites
    // all touched files (~the table); merge-on-read writes sidecars + one
    // upsert file (~the batch). bytes = what actually landed in files/
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    def scattered = spark.range(batch).select(
      (col("id") * (n / batch)).as(Changelog.KeyCol),
      lit("u").as(Changelog.OpCol),
      (col("id") * (n / batch)).as("after_id"),
      concat(lit("sc_"), col("id")).as("after_name"),
      lit(2.0).as("after_val"),
      repeat(md5(concat(lit("s"), col("id").cast("string"))), 8)
        .as("after_payload"),
      lit(3000L).as(Changelog.TsCol))
    val cowStore = new ManifestStore(s"$base/cow", spark, "id")
    cowStore.commit(table, batchId = 0, nFiles = nFiles)
    val morStore = new ManifestStore(s"$base/mor", spark, "id")
    morStore.commit(table, batchId = 0, nFiles = nFiles)
    val cowB0 = dirBytes(java.nio.file.Paths.get(s"$base/cow/files"))
    val (_, cowSec) = time(cowStore.merge(scattered, fields, batchId = 1).get)
    val cowMb = (dirBytes(java.nio.file.Paths.get(s"$base/cow/files")) - cowB0) / 1e6
    val morB0 = dirBytes(java.nio.file.Paths.get(s"$base/mor/files"))
    val (morStats, morSec) = time(morStore.mergeOnRead(scattered, fields, batchId = 1).get)
    val morMb = (dirBytes(java.nio.file.Paths.get(s"$base/mor/files")) - morB0) / 1e6
    println(s"""{"metric":"mor_bench","batch":$batch,"cow_sec":${f"$cowSec%.2f"},"cow_written_mb":${f"$cowMb%.1f"},"mor_sec":${f"$morSec%.2f"},"mor_written_mb":${f"$morMb%.1f"},"masked_files":${morStats.maskedFiles},"write_amp_ratio":${f"${cowMb / morMb}%.1f"}}""")
    spark.stop()
  }
}
