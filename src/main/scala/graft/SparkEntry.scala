package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registries live in `graft.queries.*`; each exposes a `queries` map
  * (name -> (SparkSession, sfDir) => DataFrame) and a matching `oracles` map
  * of DuckDB SQL that recomputes the same result on the same parquet tables.
  */
object SparkEntry {
  /** Flagship: apply a synthesized Debezium changelog to the customer
    * snapshot and return the merged table (SURVEY §7.2).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_apply_changelog")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CdcQueries.queries ++ graft.queries.OpsQueries.queries ++
      graft.queries.RelQueries.queries ++ graft.queries.CurationQueries.queries ++
      graft.queries.SketchQueries.queries ++ graft.queries.DsvQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CdcQueries.oracles ++ graft.queries.OpsQueries.oracles ++
      graft.queries.RelQueries.oracles ++ graft.queries.CurationQueries.oracles ++
      graft.queries.SketchQueries.oracles ++ graft.queries.DsvQueries.oracles
}
