package graft.spark

import graft.cdc.{Changelog, ManifestStore}
import org.apache.spark.sql.functions._

/** The per-trigger cost of the CDF admission walk on a LONG backlog —
  * the r17 memo's receipt. A filtered consumer catching up over N
  * captured versions walks the whole remaining backlog in EVERY
  * `latestOffset` call; when the filter excludes the backlog (the
  * catch-up shape: only recent versions match), each walk used to
  * re-derive N capture cuts from scratch (~ms each — ~30 s of planning
  * per trigger at 10k versions). With the memo, the FIRST walk pays the
  * cuts once and every later trigger's walk is O(N) map hits.
  *
  * Usage: `sbt "runMain graft.spark.CdfAdmissionBench [versions]"` —
  * default 1000. Prints one JSON line: cold (first) walk ms, warm
  * (memoized re-walk) ms over the same backlog, and the per-version
  * cut count from the admission probe.
  */
object CdfAdmissionBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000)
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cdfadm")
      .toString + "/table"
    val st = new ManifestStore(root, spark, "id")
    st.enableChangeFeed()
    val seed = (0L until 1000L).map(i => (i, s"n$i")).toDF("id", "name")
    st.commit(seed, batchId = 0, nFiles = 4, statsCols = Seq("name"))
    // N captured versions, one-row updates — every capture records name
    // stats far below the consumer's filter, so the whole backlog is
    // free riders and each walk must judge every version
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      val net = Seq(((i % 1000).toLong.toString, "u", i.toLong,
        (i % 1000).toLong, s"e$i"))
        .toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
          "after_id", "after_name")
      st.mergeOnReadLocked(net, Seq("id", "name"), batchId = i,
        tsGuard = false)
      ()
    }
    val buildSec = (System.nanoTime() - t0) / 1e9

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      st.currentManifest.get.schemaDDL)
    val stream = new GraftCdfMicroBatchStream(root, "id", schema,
      Map("readChangeFeed" -> "true", "startingVersion" -> "1",
        "maxRowsPerTrigger" -> "10",
        "pruneFilter" -> "name >= 'zzz'"))
    val limit = org.apache.spark.sql.connector.read.streaming
      .ReadLimit.allAvailable()
    def walkMs(): Double = {
      val w0 = System.nanoTime()
      val end = stream.latestOffset(GraftOffset(0L), limit)
      require(end.asInstanceOf[GraftOffset].version == n.toLong,
        s"walk must traverse the whole free-rider backlog, got $end")
      (System.nanoTime() - w0) / 1e6
    }
    val cutsBefore = GraftCdfMicroBatchStream.admissionPrunes.get()
    val cold = walkMs() // pays every per-version cut exactly once
    val cutsCold = GraftCdfMicroBatchStream.admissionPrunes.get() - cutsBefore
    val warms = (1 to 9).map(_ => walkMs()).sorted
    val cutsTotal = GraftCdfMicroBatchStream.admissionPrunes.get() - cutsBefore
    println(
      s"""{"bench":"cdfadmission","versions":$n,""" +
        s""""build_sec":${"%.1f".format(buildSec)},""" +
        s""""cold_walk_ms":${"%.1f".format(cold)},""" +
        s""""warm_walk_ms":${"%.2f".format(warms(warms.size / 2))},""" +
        s""""cuts_cold":$cutsCold,"cuts_after_9_rewalks":$cutsTotal}""")
    spark.stop()
  }
}
