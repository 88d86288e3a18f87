package graft.spark

import graft.SparkSpec
import graft.cdc.ManifestStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** NULL-predicate file pruning from the manifest's per-file null counts:
  * `c IS NULL` skips files recorded null-free on c; `c IS NOT NULL` skips
  * files whose every raw row is null. Spark pushes IsNotNull alongside
  * almost every predicate, so on sparse columns this trims scans that
  * ranges alone cannot (an all-null file has NO min/max to range on).
  */
class NullPruneSpec extends SparkSpec {
  import spark.implicits._

  private def plannedFiles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputPartitions.size
    }.getOrElse(-1)
  }

  test("IS NULL / IS NOT NULL prune on recorded null counts") {
    val root = Files.createTempDirectory("nullpr").toString
    val st = new ManifestStore(root, spark, "id")
    // key-clustered 8 files; `opt` is ALL-NULL for the low half of the
    // key space and fully populated for the high half
    val df = (0L until 4000L).map(i =>
      (i, if (i < 2000L) None else Some(s"v$i"), s"n$i"))
      .toDF("id", "opt", "name")
    st.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("opt"))
    val m = st.currentManifest.get
    assert(m.files.size == 8)

    val notNull = spark.read.format("graft").load(root)
      .filter(col("opt").isNotNull)
    val pNotNull = plannedFiles(notNull)
    assert(pNotNull <= 4, s"IS NOT NULL should skip the all-null files: $pNotNull")
    assert(notNull.count() == 2000L)

    val isNull = spark.read.format("graft").load(root)
      .filter(col("opt").isNull)
    val pIsNull = plannedFiles(isNull)
    assert(pIsNull <= 4, s"IS NULL should skip the null-free files: $pIsNull")
    assert(isNull.count() == 2000L)

    // combined with a value predicate: both prunes compose
    val combo = spark.read.format("graft").load(root)
      .filter(col("opt").isNotNull && col("id") < 2500L)
    assert(plannedFiles(combo) <= 2, "null + range prunes must compose")
    assert(combo.count() == 500L)

    // a column without recorded stats never prunes (conservative)
    val un = spark.read.format("graft").load(root)
      .filter(col("name").isNotNull)
    assert(plannedFiles(un) == 8)
    assert(un.count() == 4000L)
  }
}
