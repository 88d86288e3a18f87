package graft.queries

import graft.cdc._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC operator queries + DuckDB oracles.
  *
  * Inputs are deterministic Debezium JSON changelogs synthesized from the
  * driver's `customer.parquet` (see [[graft.cdc.ChangelogGen]]), so each
  * oracle recomputes the expected result with plain SQL arithmetic — the
  * JSON round-trip is exercised only on the Spark side.
  */
object CdcQueries {
  import Changelog.SeqCol
  private val fields = ChangelogGen.customerFields
  private val names  = ChangelogGen.customerFieldNames

  /** parse -> flatten -> key over the generated changelog, with the dynamic
    * schema-inference path engaged (infer from first event, ref:
    * cdc_stream.py:573-577).
    */
  private def flattened(s: SparkSession, dir: String): DataFrame = {
    val raw = ChangelogGen.customerChangelog(s, dir)
    val inferred = Envelope.inferFieldInfo(raw.select("value").head().getString(0))
    val env = Envelope.envelopeSchema(Envelope.recordSchema(inferred))
    Changelog.withKey(
      Changelog.flatten(Changelog.parse(raw, env), inferred.map(_.name)), "c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_parse_flatten" -> ((s, dir) => flattened(s, dir).drop(SeqCol)),

    "cdc_dedup_latest" -> ((s, dir) =>
      Changelog.dedupLatest(flattened(s, dir)).drop(SeqCol)),

    "cdc_apply_changelog" -> ((s, dir) => {
      val snapshot = s.read.parquet(s"$dir/customer.parquet")
      val net = Changelog.dedupLatest(flattened(s, dir))
      Merge.applyChanges(snapshot, net, "c_custkey", names)
    }),

    "cdc_sql_history" -> ((s, dir) =>
      SqlHistory.fromFlattened(flattened(s, dir), "customer", fields, "c_custkey")
        .select("key_value", "timestamp", "sql_text")),

    "cdc_mongo_normalize" -> ((s, dir) => {
      // Mongo path: synthesize extended-JSON docs from `events`, then
      // normalize BSON wrappers with the Catalyst-native typed extraction.
      val ev = s.read.parquet(s"$dir/events.parquet")
      val doc = concat(
        lit("{\"_id\": {\"$oid\": \""), md5(col("event_id").cast("string")),
        lit("\"}, \"ts\": {\"$date\": "), unix_millis(col("ts")).cast("string"),
        lit("}, \"user\": {\"$numberLong\": \""), col("user_id").cast("string"),
        lit("\"}, \"etype\": \""), col("event_type"), lit("\"}"))
      val docSchema = StructType(Seq(
        StructField("_id", StructType(Seq(StructField("$oid", StringType)))),
        StructField("ts", StructType(Seq(StructField("$date", LongType)))),
        StructField("user", StructType(Seq(StructField("$numberLong", StringType)))),
        StructField("etype", StringType)))
      val parsed = MongoChangelog.extractTyped(doc, docSchema)
      ev.select(
        parsed.getField("_id").getField("$oid").as("oid"),
        parsed.getField("ts").getField("$date").as("ts_ms"),
        parsed.getField("user").getField("$numberLong").cast("long").as("user_id"),
        parsed.getField("etype").as("event_type"))
    }))

  private val fl = ChangelogGen.flattenedSql
  private val latestCte =
    """, latest AS (
      |  SELECT * FROM fl
      |  QUALIFY row_number() OVER (PARTITION BY key_value ORDER BY "timestamp" DESC) = 1
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "cdc_parse_flatten" -> s"$fl SELECT * FROM fl",

    "cdc_dedup_latest" -> s"$fl$latestCte SELECT * FROM latest",

    "cdc_apply_changelog" ->
      s"""$fl$latestCte
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         |       CAST(NULL AS BIGINT) AS last_ts
         |FROM customer WHERE c_custkey NOT IN (SELECT key_value FROM latest)
         |UNION ALL
         |SELECT after_c_custkey, after_c_name, after_c_nationkey,
         |       after_c_acctbal, after_c_mktsegment, "timestamp"
         |FROM latest WHERE operation <> 'd'""".stripMargin,

    "cdc_sql_history" ->
      s"""$fl SELECT key_value, "timestamp",
         |CASE operation
         |  WHEN 'd' THEN 'DELETE FROM customer WHERE c_custkey = ' || key_value || ';'
         |  WHEN 'u' THEN 'UPDATE customer SET c_name = ''' || replace(after_c_name, '''', '''''')
         |       || ''', c_nationkey = ' || after_c_nationkey
         |       || ', c_acctbal = ' || printf('%.2f', after_c_acctbal)
         |       || ', c_mktsegment = ''' || replace(after_c_mktsegment, '''', '''''')
         |       || ''' WHERE c_custkey = ' || key_value || ';'
         |  ELSE 'INSERT INTO customer (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment) VALUES ('
         |       || after_c_custkey || ', ''' || replace(after_c_name, '''', '''''')
         |       || ''', ' || after_c_nationkey || ', ' || printf('%.2f', after_c_acctbal)
         |       || ', ''' || replace(after_c_mktsegment, '''', '''''') || ''');'
         |END AS sql_text
         |FROM fl""".stripMargin,

    "cdc_mongo_normalize" ->
      """SELECT md5(CAST(event_id AS VARCHAR)) AS oid, epoch_ms(ts) AS ts_ms,
        |       user_id, event_type
        |FROM events""".stripMargin)
}
