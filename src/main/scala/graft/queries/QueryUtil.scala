package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object QueryUtil {
  /** Scans of few-row-group files plan fewer splits than cores, serializing
    * the heavy per-row work (md5 shingles, JSON parse, vector folds). At
    * production scale splits come free from file count; this guard only
    * fires when a scan under-splits (exactly the local-bench shape) and
    * costs one cheap shuffle of the raw rows.
    */
  def scanParallel(df: DataFrame, s: SparkSession): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

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
