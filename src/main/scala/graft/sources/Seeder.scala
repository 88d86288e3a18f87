package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seed-data loading (ref: dataframe_to_postgresql.py — CSV/parquet read
  * :65-76, shuffle `sample(frac=1)` :65,74, batch slicing :82-100).
  *
  * The reference seeds a JDBC database; in engine scope the useful part is
  * the source shape: header-aware CSV / parquet ingest, deterministic
  * shuffle, and batch slicing for replayed loads. A JDBC target would be
  * `df.write.jdbc(url, table, props)` verbatim — no JDBC driver jar ships
  * in this env, so that last hop stays out of scope (SURVEY §2.2 K7).
  */
object Seeder {

  /** S5: header CSV with schema inference. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S6: parquet. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** O4: deterministic row shuffle (ref `sample(frac=1)`), seeded so runs
    * are reproducible.
    */
  def shuffled(df: DataFrame, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed))

  /** Batch slicing for replayed seeding (ref batch/sleep/repeat knobs):
    * assigns a stable batch id per row — callers iterate batches with a
    * filter, keeping each slice a pruned scan instead of a driver collect.
    */
  def withBatchId(df: DataFrame, batchSize: Int, orderCol: String): DataFrame =
    df.withColumn("_batch_id",
      floor((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))).cast("long") - 1) / batchSize))
}
