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
  * Three legs (r17):
  *   - the REAL-table A/B at `nFiles` (default 256) — the shape a
  *     filtered scan/feed actually pushes;
  *   - a DECIMAL leg on the same table: off-grid decimal(10,2) probes,
  *     which fell back wholesale to the Column job before r17 (a
  *     money-keyed CDC table paid the old constant on EVERY plan) and
  *     now canonicalize onto the scale grid driver-side;
  *   - SYNTHETIC-SCALE legs at 65k/262k manifest entries (metadata
  *     only, no data files — a real 100 TB table is 10^5-10^6 files):
  *     the driver arithmetic must stay sub-100 ms where the Column
  *     path's local job is list-serialization-bound.
  *
  * Usage: `sbt "runMain graft.PlanConstBench [nFiles] [synthFiles...]"`
  * — defaults 256 and 65536 262144. Prints one JSON line (times in
  * milliseconds, median of repeated calls after warmup).
  */
object PlanConstBench {
  private val Reps = 21

  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toInt).getOrElse(256)
    val synthSizes =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(65536, 262144)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("planconst")
      .toString + "/table"
    ManifestStore.writeTableProps(root, Map("bloomfilter" -> "8192"))
    val st = new ManifestStore(root, spark, "id")
    st.commit(spark.range(0L, nFiles * 1000L).selectExpr(
      "id", "CAST(id AS STRING) AS name",
      "CAST(id % 977 AS STRING) AS tag",
      "CAST((id % 100000) / 100.0 AS DECIMAL(10,2)) AS amt"),
      batchId = 0, nFiles = nFiles, statsCols = Seq("tag", "amt"))
    val m = st.currentManifest.get

    // the shape a filtered scan/feed actually pushes: a key range plus a
    // scattered equality plus a small IN
    val preds: Seq[(String, String, Any)] = Seq(
      ("id", ">=", 1000L), ("id", "<", 200000L),
      ("tag", "=", "123"),
      ("id", "in", Seq(1500L, 2500L, 199999L)))
    // money-keyed shape: OFF-GRID decimal probes (scale 3 on a (10,2)
    // column) — canonicalized to grid-exact driver-side since r17
    val decPreds: Seq[(String, String, Any)] = Seq(
      ("amt", ">=", new java.math.BigDecimal("10.005")),
      ("amt", "<", new java.math.BigDecimal("120.755")),
      ("amt", "in", Seq(new java.math.BigDecimal("11.23"),
        new java.math.BigDecimal("55.555"))))

    def runMode(mm: ManifestStore.Manifest, ps: Seq[(String, String, Any)],
                driver: Boolean, reps: Int = Reps)
        : (Double, Double, Seq[String]) = {
      spark.conf.set("spark.graft.prune.driverEval", driver.toString)
      var kept: Seq[String] = Nil
      // COLD = the first call of this mode in the session: the Column
      // path pays plan analysis + codegen per new predicate shape — the
      // constant a stream's first trigger or any fresh filter pays
      val c0 = System.nanoTime()
      kept = st.prunedFiles(mm, ps).map(_.name)
      val coldMs = (System.nanoTime() - c0) / 1e6
      (1 to 2).foreach(_ => kept = st.prunedFiles(mm, ps).map(_.name))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        kept = st.prunedFiles(mm, ps).map(_.name)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      (coldMs, times(reps / 2), kept)
    }

    val (sparkCold, sparkMs, keptSpark) = runMode(m, preds, driver = false)
    val (driverCold, driverMs, keptDriver) = runMode(m, preds, driver = true)
    require(keptSpark == keptDriver,
      s"kept sets diverged: spark=$keptSpark driver=$keptDriver")

    val (_, decSparkMs, keptDecS) = runMode(m, decPreds, driver = false)
    val (decDriverCold, decDriverMs, keptDecD) =
      runMode(m, decPreds, driver = true)
    require(keptDecS == keptDecD,
      s"decimal kept sets diverged: spark=$keptDecS driver=$keptDecD")

    // SYNTHETIC SCALE: manifests fabricated from metadata alone — file i
    // covers keys [i*1000, i*1000+999], tag/amt stats follow the same
    // layout as the real commit. prunedFiles touches only driver-held
    // stats (no Bloom sidecars staged), so no data files are needed.
    def synthManifest(n: Int): ManifestStore.Manifest = {
      val files = (0 until n).map { i =>
        val lo = i * 1000L
        val amtLo = (lo % 100000L) / 100.0
        ManifestStore.FileEntry(s"synth-$i.parquet",
          lo.toString, (lo + 999L).toString, 1000L,
          cols = Map(
            "tag" -> ("0", "999"), // tag is modular: effectively table-wide
            "amt" -> (f"$amtLo%.2f", f"${amtLo + 9.99}%.2f")),
          colNulls = Map("tag" -> 0L, "amt" -> 0L))
      }
      m.copy(files = files)
    }
    val synth = synthSizes.map { n =>
      val sm = synthManifest(n)
      val (_, sMs, kS) = runMode(sm, preds, driver = false, reps = 5)
      val (_, dMs, kD) = runMode(sm, preds, driver = true, reps = 5)
      require(kS == kD,
        s"synthetic kept sets diverged at $n files: ${kS.size} vs ${kD.size}")
      (n, sMs, dMs, kD.size)
    }
    spark.conf.unset("spark.graft.prune.driverEval")

    val synthJson = synth.map { case (n, sMs, dMs, kept) =>
      s"""{"files":$n,"kept":$kept,""" +
        s""""spark_warm_ms":${"%.1f".format(sMs)},""" +
        s""""driver_warm_ms":${"%.2f".format(dMs)}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"bench":"planconst","files":$nFiles,""" +
        s""""kept_files":${keptDriver.size},""" +
        s""""spark_cold_ms":${"%.1f".format(sparkCold)},""" +
        s""""spark_warm_ms":${"%.2f".format(sparkMs)},""" +
        s""""driver_cold_ms":${"%.2f".format(driverCold)},""" +
        s""""driver_warm_ms":${"%.3f".format(driverMs)},""" +
        s""""warm_speedup":${"%.0f".format(sparkMs / driverMs)},""" +
        s""""cold_speedup":${"%.0f".format(sparkCold / driverCold)},""" +
        s""""decimal_spark_warm_ms":${"%.2f".format(decSparkMs)},""" +
        s""""decimal_driver_warm_ms":${"%.3f".format(decDriverMs)},""" +
        s""""decimal_driver_cold_ms":${"%.2f".format(decDriverCold)},""" +
        s""""synthetic":$synthJson}""")
    spark.stop()
  }
}
