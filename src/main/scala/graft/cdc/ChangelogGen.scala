package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic Debezium-JSON changelog synthesis from the `customer` table.
  *
  * Plays the role of the reference's Kafka topic fed by the workload
  * generator (ref: test/cdc_test_framework.py) — but *deterministic*, so the
  * driver's DuckDB oracle can recompute the expected flattened/merged state
  * with plain SQL arithmetic (no JSON, no hashing):
  *
  *   keys     : customers with c_custkey % 7 < 3       (rest stay untouched)
  *   events   : i = 0..2 per key
  *   op(i)    : (c_custkey + i) % 5 -> 0:'c' 1:'u' 2:'u' 3:'r' 4:'d'
  *   ts_ms    : 1700000000000 + c_custkey*10 + i       (unique, monotone)
  *   after(i) : name || "_v" || i, acctbal + i         (op != 'd')
  *   before(i): name || "_v" || (i-1), acctbal + (i-1) (op in 'u','d')
  *
  * Each event is a full Debezium envelope: the constant `schema.fields` block
  * (so schema inference has real input) + a `payload` rendered by `to_json`.
  * Everything is expression-level — generation itself is shuffle-free and
  * scales linearly with the source table.
  */
object ChangelogGen {
  val EventsPerKey = 3
  val BaseTs = 1700000000000L

  val customerFields: Seq[Envelope.FieldInfo] = Seq(
    Envelope.FieldInfo("c_custkey", "int64", optional = false),
    Envelope.FieldInfo("c_name", "string"),
    Envelope.FieldInfo("c_nationkey", "int32"),
    Envelope.FieldInfo("c_acctbal", "double"),
    Envelope.FieldInfo("c_mktsegment", "string"))

  val customerFieldNames: Seq[String] = customerFields.map(_.name)

  /** Debezium JSON events (single `value` string column + `_seq`) derived
    * from `<sfDir>/customer.parquet`.
    */
  def customerChangelog(spark: SparkSession, sfDir: String): DataFrame =
    fromCustomerDf(spark.read.parquet(s"$sfDir/customer.parquet"))

  def fromCustomerDf(customer: DataFrame): DataFrame = {
    val ev = customer
      .filter(col("c_custkey") % 7 < 3)
      .withColumn("i", explode(sequence(lit(0), lit(EventsPerKey - 1))))
    val op = (col("c_custkey") + col("i")) % 5
    val opCode = when(op === 0, "c").when(op === 1, "u").when(op === 2, "u")
      .when(op === 3, "r").otherwise("d")
    val tsMs = lit(BaseTs) + col("c_custkey") * 10 + col("i")

    def image(ver: Column): Column = struct(
      col("c_custkey"),
      concat(col("c_name"), lit("_v"), ver.cast("string")).as("c_name"),
      col("c_nationkey"),
      (col("c_acctbal") + ver.cast("double")).as("c_acctbal"),
      col("c_mktsegment"))

    val after  = when(opCode =!= "d", image(col("i")))
    val before = when(opCode.isin("u", "d"), image(col("i") - 1))
    val source = struct(
      lit("2.2").as("version"), lit("postgresql").as("connector"),
      lit("graft").as("name"), tsMs.as("ts_ms"), lit("postgres").as("db"),
      lit("public").as("schema"), lit("customer").as("table"))
    val payload = struct(
      before.as("before"), after.as("after"), source.as("source"),
      opCode.as("op"), tsMs.as("ts_ms"), lit(null).cast("string").as("transaction"))

    val schemaBlock = Envelope.schemaBlockJson(customerFields)
    ev.select(
      concat(lit(s"""{"schema":$schemaBlock,"payload":"""),
        to_json(payload), lit("}")).as("value"),
      tsMs.as(Changelog.SeqCol))
  }

  /** DuckDB-SQL mirror of the generated events, used as the shared CTE prefix
    * of every CDC oracle query. Produces the same rows as
    * parse+flatten+withKey over [[fromCustomerDf]].
    */
  val flattenedSql: String = """
WITH ev AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, i,
         CASE ((c_custkey + i) % 5) WHEN 0 THEN 'c' WHEN 1 THEN 'u'
              WHEN 2 THEN 'u' WHEN 3 THEN 'r' ELSE 'd' END AS op,
         1700000000000 + c_custkey * 10 + i AS ts_ms
  FROM customer CROSS JOIN (SELECT unnest(range(3)) AS i) _i
  WHERE c_custkey % 7 < 3
), fl AS (
  SELECT
    CASE WHEN op IN ('u','d') THEN c_custkey END AS before_c_custkey,
    CASE WHEN op IN ('u','d') THEN c_name || '_v' || (i - 1) END AS before_c_name,
    CASE WHEN op IN ('u','d') THEN c_nationkey END AS before_c_nationkey,
    CASE WHEN op IN ('u','d') THEN c_acctbal + CAST(i - 1 AS DOUBLE) END AS before_c_acctbal,
    CASE WHEN op IN ('u','d') THEN c_mktsegment END AS before_c_mktsegment,
    CASE WHEN op <> 'd' THEN c_custkey END AS after_c_custkey,
    CASE WHEN op <> 'd' THEN c_name || '_v' || i END AS after_c_name,
    CASE WHEN op <> 'd' THEN c_nationkey END AS after_c_nationkey,
    CASE WHEN op <> 'd' THEN c_acctbal + CAST(i AS DOUBLE) END AS after_c_acctbal,
    CASE WHEN op <> 'd' THEN c_mktsegment END AS after_c_mktsegment,
    op AS operation, ts_ms AS "timestamp", c_custkey AS key_value
  FROM ev
)"""
}
