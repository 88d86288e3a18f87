package graft

import graft.cdc.ManifestStore
import org.apache.spark.sql.functions._

/** Scale evidence for COLUMNAR deletion-vector masking: before r13, ONE
  * masked file demoted the whole DSv2 scan to row-at-a-time readers
  * (Spark forbids mixing modes within a scan), so a single scattered
  * DELETE on a 100k-file table put every pristine file on the slow path
  * until the next OPTIMIZE folded the sidecar. Now masked files read
  * vectorized too: per batch, a hash probe per key; clean batches pass
  * through zero-copy, only batches holding a masked row pay a survivor
  * copy.
  *
  * Usage: `sbt "runMain graft.MorScanBench [nRows] [nFiles]"` — defaults
  * 60M rows / 64 files, ~100 scattered deleted keys so MOST files carry a
  * sidecar (the worst case for the old demotion). Times a full-scan
  * aggregate under the columnar path vs the row escape hatch
  * (`spark.graft.read.maskedColumnar=false` — the pre-r13 behavior).
  * Prints one JSON line.
  */
object MorScanBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(60000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("morscan")
    val root = s"$base/t"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val df = spark.range(0L, n).select(col("id"),
      concat(lit("name_"), col("id")).as("name"),
      (col("id") % 97).cast("double").as("v"),
      md5(col("id").cast("string")).as("payload"))
    val st = new ManifestStore(root, spark, "id")
    val (_, tWrite) = timed(st.commit(df, batchId = 0, nFiles = nFiles))
    // ~100 scattered keys: strided across the key space so (almost) every
    // range-clustered file carries a sidecar
    st.deleteWhere(pmod(col("id"), lit(n / 100)) === 7, batchId = 1)
    val masked = st.currentManifest.get.files.count(_.dv.isDefined)
    val expect = df.filter(pmod(col("id"), lit(n / 100)) =!= 7)
      .agg(sum(col("v")), count(lit(1))).head()

    def scan(columnar: Boolean): Double = {
      spark.conf.set("spark.graft.read.maskedColumnar", columnar.toString)
      try {
        spark.sharedState.cacheManager.clearCache()
        var best = Double.MaxValue
        (1 to 3).foreach { _ =>
          val (r, t) = timed(spark.read.format("graft").load(root)
            .agg(sum(col("v")), count(lit(1))).head())
          require(r.getDouble(0) == expect.getDouble(0) &&
            r.getLong(1) == expect.getLong(1),
            s"wrong answer: $r vs $expect")
          best = math.min(best, t)
        }
        best
      } finally spark.conf.unset("spark.graft.read.maskedColumnar")
    }
    val tRow = scan(columnar = false) // the pre-r13 whole-scan demotion
    val tCol = scan(columnar = true)
    println(s"""{"metric":"mor_scan_columnar","rows":$n,"files":$nFiles,""" +
      s""""masked_files":$masked,"row_mode_s":${f"$tRow%.2f"},""" +
      s""""columnar_s":${f"$tCol%.2f"},""" +
      s""""speedup":${f"${tRow / tCol}%.2f"},""" +
      s""""write_s":${f"$tWrite%.1f"}}""")
    spark.stop()
  }
}
