package graft

import graft.cdc.{Changelog, ManifestStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for per-file key Bloom filters (table property
  * `bloomfilter`) on the layout where zone maps are blind: a BUCKETED
  * table's files each span ~the full key range (hash buckets scatter
  * ranges), so without Blooms every point lookup plans every bucket file
  * and every one-key MERGE rewrites/masks every bucket file. With them,
  * both touch ~1 file — the 100 TB difference between a primary-key GET /
  * surgical upsert and a bucket-set scan per statement.
  *
  * Usage: `sbt "runMain graft.BloomBench [nRows] [nBuckets]"` — defaults
  * 60M rows / 64 buckets (~937k rows/file; the default 65536-bit blob is
  * undersized at that density, so this also exercises the graceful-FPP
  * regime — bump via the property for production tables). Deterministic
  * content. Prints one JSON line.
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(60000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("bloombench")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // ~256 B/row payload so a wasted file read costs real I/O; per-file
    // blob sized to ~9 bits/key at 60M/64 so the measured skip rate is
    // the production regime, not a toy
    val bitsPerFile = math.max(65536L,
      ((n / buckets) * 9L + 63L) / 64L * 64L).toInt
    val df = spark.range(0L, n).select(col("id"),
      concat(lit("name_"), col("id")).as("name"),
      repeat(md5(col("id").cast("string")), 8).as("payload"))

    def build(tag: String, bloom: Boolean): (String, ManifestStore, Double) = {
      val root = s"$base/$tag"
      ManifestStore.writeTableProps(root,
        Map("buckets" -> buckets.toString) ++
          (if (bloom) Map("bloomfilter" -> bitsPerFile.toString)
           else Map.empty))
      val st = new ManifestStore(root, spark, "id")
      val (_, t) = timed(st.commit(df, batchId = 0, nFiles = buckets))
      (root, st, t)
    }
    val (rootB, stB, tLoadB) = build("bloomy", bloom = true)
    val (rootP, stP, tLoadP) = build("plain", bloom = false)

    def plannedDataFiles(d: DataFrame): Int =
      d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.map {
            case gb: graft.spark.GraftBucketedPartition => gb.inner.length
            case _ => 1
          }.sum
      }.headOption.getOrElse(-1)

    val probes = Seq(17L, n / 3, n - 5)
    def point(root: String, k: Long): DataFrame =
      spark.read.format("graft").load(root).filter(col("id") === k)
    // warmup both paths (footers, codegen)
    point(rootB, 1L).count(); point(rootP, 1L).count()

    def bestPoint(root: String): (Int, Double) = {
      val times = probes.map { k =>
        val d = point(root, k)
        val (_, t) = timed(d.count())
        (plannedDataFiles(d), t)
      }
      (times.map(_._1).max, times.map(_._2).min)
    }
    val (filesB, tPointB) = bestPoint(rootB)
    val (filesP, tPointP) = bestPoint(rootP)

    // one-key MERGE: the prune decides how many files the CoW rewrite
    // (or a MoR mask derivation) must touch
    def oneKeyNet(k: Long): DataFrame =
      spark.range(k, k + 1).select(
        col("id").cast("string").as(Changelog.KeyCol),
        lit("u").as(Changelog.OpCol), lit(99L).as(Changelog.TsCol),
        col("id").as("after_id"), lit("upd").as("after_name"),
        lit("x").as("after_payload"))
    val fields = Seq("id", "name", "payload")
    val (outB, tMergeB) = timed(stB.mergeOptimistic(oneKeyNet(n / 2), fields,
      batchId = 1, tsGuard = false))
    val (outP, tMergeP) = timed(stP.mergeOptimistic(oneKeyNet(n / 2), fields,
      batchId = 1, tsGuard = false))
    def rewritten(o: ManifestStore.MergeOutcome): Int = o match {
      case ManifestStore.MergedAt(s) => s.rewrittenFiles
      case _                         => -1
    }

    // one-key DELETE: with prune conjuncts the effective scan covers only
    // the bloom-admitted files; without, every file pays the read
    val dk = n / 4
    val (delB, tDelB) = timed(stB.deleteWhere(col("id") === dk, batchId = 2,
      pruneConjuncts = Seq(("id", "=", dk))))
    val (delP, tDelP) = timed(stP.deleteWhere(col("id") === dk, batchId = 2))
    def masked(o: Option[ManifestStore.MorStats]): Int =
      o.map(_.maskedFiles).getOrElse(-1)

    def f(d: Double): String = "%.3f".format(d)
    println(
      s"""{"bench":"bloom","rows":$n,"buckets":$buckets,""" +
        s""""bits_per_file":$bitsPerFile,""" +
        s""""load_bloom_s":${f(tLoadB)},"load_plain_s":${f(tLoadP)},""" +
        s""""point_files_bloom":$filesB,"point_files_plain":$filesP,""" +
        s""""point_s_bloom":${f(tPointB)},"point_s_plain":${f(tPointP)},""" +
        s""""merge1_rewritten_bloom":${rewritten(outB)},""" +
        s""""merge1_rewritten_plain":${rewritten(outP)},""" +
        s""""merge1_s_bloom":${f(tMergeB)},"merge1_s_plain":${f(tMergeP)},""" +
        s""""delete1_masked_bloom":${masked(delB)},""" +
        s""""delete1_masked_plain":${masked(delP)},""" +
        s""""delete1_s_bloom":${f(tDelB)},"delete1_s_plain":${f(tDelP)}}""")
    spark.stop()
  }
}
