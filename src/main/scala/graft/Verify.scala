package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Shared session config: testdata's `events.ts` has shipped as both
    * parquet TIMESTAMP(NANOS) — readable only via the nanos-as-long legacy
    * flag, kept for that vintage — and TIMESTAMP(MICROS);
    * [[graft.queries.CdcQueries]] normalizes either to epoch-nanos BIGINT
    * (DuckDB oracles use epoch_ms/epoch_ns on its TIMESTAMP read).
    */
  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    muteAdvisoryWarns()
    s
  }

  /** The O(config)-row global windows (curation cutoffs, pipeline pack
    * offsets, manifest overlap sweep) legitimately run single-partition;
    * WindowExecBase still WARNs "No Partition Defined" per plan. Spark
    * 4.1's EliminateWindowPartitions strips any foldable partition key, so
    * the lit(0) idiom cannot silence it — mute the logger category instead
    * (the windows are bounded by construction, annotated per call site).
    * MUST run AFTER the session exists: Spark's lazy log4j bootstrap
    * (first logging call during getOrCreate) re-installs its default
    * configuration and wipes levels set before it.
    */
  def muteAdvisoryWarns(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    Verify.muteAdvisoryWarns() // setLogLevel may re-touch logger config
    new java.io.File(outDir).mkdirs()
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 restricts the dump to named queries
    // (the driver never sets it, so its runs stay exhaustive)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).filter(_.nonEmpty)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
