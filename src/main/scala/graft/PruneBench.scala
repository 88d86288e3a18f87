package graft

import graft.cdc.ManifestStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for LIMIT and TopN pushdown: on a key-clustered table,
  * `LIMIT n` must plan a file PREFIX covering n rows and `ORDER BY key
  * LIMIT n` must plan only the files that can contain the top-n — both
  * O(n / rowsPerFile) tasks — while the comparator (the same files read
  * as plain parquet, where Spark has no per-file stats) scans and/or
  * sorts the whole table.
  *
  * Usage: `sbt "runMain graft.PruneBench [nRows] [nFiles]"` — defaults
  * 60M rows / 256 files (~234k rows each), the scale of STRESS.md's
  * ladders. Deterministic content. Prints one JSON line.
  */
object PruneBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(60000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("prunebench")
    val root = s"$base/table"

    // ~256 B/row payload so scan cost is real I/O
    val df = spark.range(0L, n).select(col("id"),
      concat(lit("name_"), col("id")).as("name"),
      repeat(md5(col("id").cast("string")), 8).as("payload"))
    val st = new ManifestStore(root, spark, "id")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tLoad) = timed { st.commit(df, batchId = 0, nFiles = nFiles) }

    def scanParts(d: DataFrame): Int =
      d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.size
      }.headOption.getOrElse(-1)
    def drain(d: DataFrame): Long = d.count() // forces full materialization

    val g = spark.read.format("graft").load(root)
    // the SAME bytes through the stats-less path: plain parquet over the
    // store's files directory (what the pushdowns save)
    val raw = spark.read.parquet(s"$root/files")

    // warmup both paths (footers, codegen)
    drain(g.limit(5)); drain(raw.limit(5))

    val lim = g.limit(10)
    val (limRows, tLimit) = timed(drain(lim))
    val topQ = g.orderBy(col("id").desc).limit(10)
    val (topRows, tTop) = timed(drain(topQ))
    val (_, tTopRaw) = timed(drain(raw.orderBy(col("id").desc).limit(10)))

    println(
      s"""{"bench":"prune","rows":$n,"files":$nFiles,"load_s":${f(tLoad)},""" +
        s""""limit10_planned_files":${scanParts(lim)},""" +
        s""""limit10_s":${f(tLimit)},"limit10_rows":$limRows,""" +
        s""""topn10_planned_files":${scanParts(topQ)},""" +
        s""""topn10_s":${f(tTop)},"topn10_rows":$topRows,""" +
        s""""topn10_raw_parquet_s":${f(tTopRaw)}}""")
    spark.stop()
  }

  private def f(d: Double): String = "%.3f".format(d)
}
