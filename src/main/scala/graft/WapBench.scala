package graft

import graft.cdc.{Changelog, ManifestStore}
import org.apache.spark.sql.functions._

/** Metadata-cost evidence for write-audit-publish
  * ([[graft.cdc.ManifestStore.publishFrom]]): on a 60M-row table the
  * whole clone → audit-write → publish cycle must cost O(#files)
  * metadata, never O(table bytes) — that is what makes WAP usable at
  * 100 TB. This bench builds the table once, then reports wall seconds
  * and `/proc/self/io` wchar/rchar deltas (every byte the JVM wrote/read
  * at the VFS layer) for each step:
  *
  *   - clone: hardlink pass + one manifest write
  *   - audit write: a 1000-key scattered MERGE against the staging clone
  *     (the only step allowed to cost data I/O — O(touched files))
  *   - publish: link-new + manifest swap (the claim: ~zero data bytes)
  *
  * Usage: `sbt "runMain graft.WapBench [nRows] [nFiles]"` — defaults
  * 60M / 64. Prints one JSON line per step.
  */
object WapBench {
  private def procIo(): Map[String, Long] =
    scala.io.Source.fromFile("/proc/self/io").getLines().flatMap { l =>
      l.split(":\\s*") match {
        case Array(k, v) => Some(k -> v.toLong)
        case _           => None
      }
    }.toMap

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(60000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("graft_wapb_").toString
    val root = base + "/t"
    val stage = base + "/t_wap"
    val st = new ManifestStore(root, spark, "id")
    st.commit(spark.range(n).select(col("id"),
      concat(lit("name-"), col("id")).as("name"),
      sha2(col("id").cast("string"), 512).as("payload")),
      batchId = 0L, nFiles = nFiles, streamId = "wapb-init")
    val tableBytes = st.currentManifest.get.files.map(_.bytes).sum

    def step(name: String)(body: => Unit): Unit = {
      val io0 = procIo(); val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      val io1 = procIo()
      def mb(k: String) = (io1(k) - io0(k)) / 1e6
      println(f"""{"step":"$name","wall_sec":$sec%.3f,""" +
        f""""wchar_mb":${mb("wchar")}%.2f,"rchar_mb":${mb("rchar")}%.2f}""")
    }

    step("clone")(st.cloneTo(stage))
    val sg = new ManifestStore(stage, spark, "id")
    step("audit_merge_1000keys") {
      val net = spark.range(1000L).select(
        (col("id") * 60013L % n).cast("string").as(Changelog.KeyCol),
        lit("u").as(Changelog.OpCol), lit(1L).as(Changelog.TsCol),
        (col("id") * 60013L % n).as("after_id"),
        lit("audited").as("after_name"),
        lit("x").as("after_payload"))
      sg.mergeOptimistic(net, Seq("id", "name", "payload"), batchId = 1L,
        streamId = "wapb-audit", tsGuard = false)
      ()
    }
    step("publish")(st.publishFrom(stage))
    println(s"""{"table_bytes":$tableBytes,"rows":${st.read().get.count()},""" +
      s""""files":${st.currentManifest.get.files.size}}""")
    spark.stop()
  }
}
