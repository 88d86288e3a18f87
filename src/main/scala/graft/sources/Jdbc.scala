package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7/K7 — JDBC read and write (ref: test/validate_cdc_data.py:92-102
  * reads the source database for validation; dataframe_to_postgresql.py:89
  * bulk-writes a DataFrame into the target DB).
  *
  * Spark's built-in JDBC relation does the heavy lifting; these wrappers
  * pin the options that matter at scale:
  *   - [[readPartitioned]] splits the scan into `numPartitions` parallel
  *     range queries on a numeric column — the default single-connection
  *     scan serializes the whole table through one executor;
  *   - [[write]] uses batched inserts (`batchsize`) and caps writer
  *     parallelism via an optional coalesce so a 1000-partition frame
  *     doesn't open 1000 simultaneous connections against the DB.
  *
  * Verified against embedded Derby — the JDBC engine shipped in Spark's own
  * jars — which exercises the identical Spark JDBC code path a server DB
  * (the reference's Postgres) uses; only the url/driver differ.
  */
object Jdbc {

  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Single-partition read — fine for dimension-sized tables. */
  def read(spark: SparkSession, url: String, table: String,
           driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()

  /** Parallel range-partitioned read: `numPartitions` concurrent scans of
    * `WHERE partitionColumn BETWEEN ...` stripes — the shape a big source
    * table needs (ref reads everything through one cursor).
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int, driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Batched JDBC write. `maxConnections` caps concurrent writers (each
    * partition opens one connection); `batchSize` rows per INSERT batch.
    */
  def write(df: DataFrame, url: String, table: String, mode: String = "append",
            batchSize: Int = 1000, maxConnections: Option[Int] = None,
            driver: String = DerbyDriver): Unit = {
    val capped = maxConnections match {
      case Some(n) if df.rdd.getNumPartitions > n => df.coalesce(n)
      case _ => df
    }
    capped.write.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .option("batchsize", batchSize)
      .mode(mode)
      .save()
  }
}
