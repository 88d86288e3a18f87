package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

object QueryUtil {
  /** `events` with `ts` normalized to epoch-NANOS BIGINT regardless of the
    * physical parquet vintage: the generator has shipped `ts` both as
    * INT64 timestamp(NANOS) (which Spark reads as BIGINT under the
    * nanosAsLong flag — nanos pass through) and as timestamp(MICROS)
    * (read as TIMESTAMP/_NTZ — cast via the UTC session zone, then
    * micros*1000). Every downstream query and every oracle
    * (`epoch_ns(ts)` in DuckDB) computes over the same nanos-since-epoch
    * values either way. ONE definition — the per-object copies this
    * replaces could drift when the next vintage ships.
    */
  def eventsNormalized(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val norm = raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn("ts",
        expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }
    scanParallel(norm, s)
  }

  /** Scans of few-row-group files plan fewer splits than cores, serializing
    * the heavy per-row work (md5 shingles, JSON parse, vector folds). At
    * production scale splits come free from file count; this guard only
    * fires when a scan under-splits (exactly the local-bench shape) and
    * costs one cheap shuffle of the raw rows.
    */
  def scanParallel(df: DataFrame, s: SparkSession): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (plannedPartitions(df) < target) df.repartition(target) else df
  }

  /** Partition count of `df`'s physical plan — the pruning-gate probe.
    * `df.rdd` would build a SECOND QueryExecution (it appends a
    * row-deserializer plan and re-plans the query); this walks the one
    * execution the query already owns and asks its executed plan's RDD
    * lineage, so the gate costs zero extra planning.
    */
  def plannedPartitions(df: DataFrame): Int =
    df.queryExecution.executedPlan.execute().getNumPartitions

  /** Per-JVM scratch directory for round-trip queries. Stable within one
    * JVM (smoke + verify + bench best-of-3 re-runs all overwrite in place,
    * never leaking a copy per invocation) but unique per process and owner,
    * so two concurrent suite runs can't race on one path and another local
    * user can't pre-create it. Removed recursively at JVM exit.
    */
  def scratchDir(tag: String): String = {
    val root = scratchRoot
    new java.io.File(root, tag).toString
  }

  private lazy val scratchRoot: java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(
      s"graft_scratch_${sys.props.getOrElse("user.name", "u")}_").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d)
    }))
    d
  }
}
