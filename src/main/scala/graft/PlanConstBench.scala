package graft

import graft.cdc.ManifestStore

/** The planning CONSTANT of zone-map file pruning — the ~0.5 s local
  * Spark job every pruning surface (batch scan, feed plan, skip-ahead
  * mask, merge candidate cut) paid per call before r16, vs the
  * driver-side typed evaluation that replaced it. Times the SAME
  * `prunedFiles` call under both modes on the same manifest and checks
  * the kept sets are identical; the Column path stays reachable via
  * `spark.graft.prune.driverEval=false` precisely so this A/B stays
  * honest round over round.
  *
  * Usage: `sbt "runMain graft.PlanConstBench [nFiles]"` — default 256.
  * Prints one JSON line (times in milliseconds, median of `Reps` calls
  * after warmup).
  */
object PlanConstBench {
  private val Reps = 21

  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toInt).getOrElse(256)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("planconst")
      .toString + "/table"
    ManifestStore.writeTableProps(root, Map("bloomfilter" -> "8192"))
    val st = new ManifestStore(root, spark, "id")
    st.commit(spark.range(0L, nFiles * 1000L).selectExpr(
      "id", "CAST(id AS STRING) AS name",
      "CAST(id % 977 AS STRING) AS tag"),
      batchId = 0, nFiles = nFiles, statsCols = Seq("tag"))
    val m = st.currentManifest.get

    // the shape a filtered scan/feed actually pushes: a key range plus a
    // scattered equality plus a small IN
    val preds: Seq[(String, String, Any)] = Seq(
      ("id", ">=", 1000L), ("id", "<", 200000L),
      ("tag", "=", "123"),
      ("id", "in", Seq(1500L, 2500L, 199999L)))

    def runMode(driver: Boolean): (Double, Double, Seq[String]) = {
      spark.conf.set("spark.graft.prune.driverEval", driver.toString)
      var kept: Seq[String] = Nil
      // COLD = the first call of this mode in the session: the Column
      // path pays plan analysis + codegen per new predicate shape — the
      // constant a stream's first trigger or any fresh filter pays
      val c0 = System.nanoTime()
      kept = st.prunedFiles(m, preds).map(_.name)
      val coldMs = (System.nanoTime() - c0) / 1e6
      (1 to 2).foreach(_ => kept = st.prunedFiles(m, preds).map(_.name))
      val times = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        kept = st.prunedFiles(m, preds).map(_.name)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      (coldMs, times(Reps / 2), kept)
    }

    val (sparkCold, sparkMs, keptSpark) = runMode(driver = false)
    val (driverCold, driverMs, keptDriver) = runMode(driver = true)
    require(keptSpark == keptDriver,
      s"kept sets diverged: spark=$keptSpark driver=$keptDriver")
    spark.conf.unset("spark.graft.prune.driverEval")

    println(
      s"""{"bench":"planconst","files":$nFiles,""" +
        s""""kept_files":${keptDriver.size},""" +
        s""""spark_cold_ms":${"%.1f".format(sparkCold)},""" +
        s""""spark_warm_ms":${"%.2f".format(sparkMs)},""" +
        s""""driver_cold_ms":${"%.2f".format(driverCold)},""" +
        s""""driver_warm_ms":${"%.3f".format(driverMs)},""" +
        s""""warm_speedup":${"%.0f".format(sparkMs / driverMs)},""" +
        s""""cold_speedup":${"%.0f".format(sparkCold / driverCold)}}""")
    spark.stop()
  }
}
