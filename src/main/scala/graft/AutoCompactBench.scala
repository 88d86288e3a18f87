package graft

import graft.cdc.ManifestStore
import graft.spark.GraftMaintenance
import org.apache.spark.sql.functions._

/** Small-file-debt evidence for the streaming auto-compaction gate
  * ([[graft.spark.GraftMaintenance]], table property
  * `autocompact.files=N`): a long-lived ingest commits one upsert file
  * per epoch, and under SCATTERED keys (the production shape — arrivals
  * spread across the key space) every epoch file overlaps the whole key
  * range, so zone maps cannot prune them and every point lookup pays the
  * accreted file count. This bench runs the SAME 60-epoch merge-on-read
  * ingest twice — with and without the property — scheduling the
  * off-thread probe after each commit exactly as the streaming sink does,
  * and reports per leg:
  *
  *   - ingest wall seconds (the probe must not tax the ingest path)
  *   - final live file count (bounded vs accreted)
  *   - one-key lookup seconds post-ingest (the small-file read tax)
  *   - full-scan count seconds post-ingest
  *
  * Usage: `sbt "runMain graft.AutoCompactBench [baseRows] [epochs]
  * [rowsPerEpoch]"` — defaults 20M / 60 / 20k. Prints one JSON line per
  * leg.
  */
object AutoCompactBench {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val epochs = args.lift(1).map(_.toInt).getOrElse(60)
    val perEpoch = args.lift(2).map(_.toLong).getOrElse(20000L)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def leg(bound: Option[Int]): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_acb_").toString + "/store"
      bound.foreach(b => ManifestStore.writeTableProps(root,
        Map("autocompact.files" -> b.toString)))
      val st = new ManifestStore(root, spark, "id")
      st.commit(spark.range(base).select(col("id"),
        concat(lit("name-"), col("id")).as("name")),
        batchId = 0L, nFiles = 16, streamId = "acb-init")
      val fields = Seq("id", "name")
      val t0 = System.nanoTime()
      (1 to epochs).foreach { e =>
        // scattered arrivals: epoch e's keys stride across [base, base+64M)
        // so every epoch file's (min,max) hull spans the whole insert range
        val k = lit(base) + lit(e.toLong) + col("id") * 3209L
        val net = spark.range(perEpoch).select(
          k.cast("string").as(graft.cdc.Changelog.KeyCol),
          lit("u").as(graft.cdc.Changelog.OpCol),
          lit(e.toLong).as(graft.cdc.Changelog.TsCol),
          k.as("after_id"),
          concat(lit("e"), lit(e), lit("-"), col("id")).as("after_name"))
        st.mergeOnReadLocked(net, fields, batchId = e.toLong,
          streamId = "acb-ingest", tsGuard = false)
        // exactly the sink's post-commit hook: off-thread probe, never inline
        GraftMaintenance.maybeSchedule(root, spark, "id")
      }
      val ingestSec = (System.nanoTime() - t0) / 1e9
      GraftMaintenance.drain(timeoutMs = 600000L)
      val files = st.currentManifest.get.files.size
      // post-ingest read tax: a key from a mid-run epoch (hits every
      // unpruned epoch file's hull) and a full-table count
      val probeKey = base + 30L + 999L * 3209L
      val l0 = System.nanoTime()
      st.lookup(Seq(probeKey)).get.collect()
      val lookupSec = (System.nanoTime() - l0) / 1e9
      val s0 = System.nanoTime()
      val total = st.read().get.count()
      val scanSec = (System.nanoTime() - s0) / 1e9
      println(s"""{"leg":"${bound.map(b => s"autocompact=$b")
        .getOrElse("unbounded")}","files":$files,""" +
        f""""ingest_sec":$ingestSec%.2f,"lookup_sec":$lookupSec%.3f,""" +
        f""""scan_sec":$scanSec%.2f,"rows":$total}""")
    }

    leg(None)
    leg(Some(16))
    spark.stop()
  }
}
