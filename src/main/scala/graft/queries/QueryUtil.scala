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
}
