package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Randomized CDC workload generator — the engine-side equivalent of the
  * reference's live workload tool (ref: test/cdc_test_framework.py:160-189:
  * a weighted 50/30/20 insert/update/delete stream against the customer
  * table, summarized by an inserts-minus-deletes count check).
  *
  * Unlike the reference's wall-clock random loop, every op here derives
  * from md5(seed, tag, i): one seed value reproduces the exact stream on
  * any engine, which is what lets the property specs fold the stream
  * independently and compare final states. Generation is pure expressions
  * over `spark.range` — shuffle-free and linear at any n.
  */
object WorkloadGen {

  val BaseTs = 1800000000000L

  /** Seeded uniform in [0, 2^32) from (seed, tag, i) — 8 hex chars of md5,
    * the same engine-portable trick the MinHash path uses.
    */
  private def h(seed: Long, tag: String): Column =
    conv(substring(md5(concat_ws("-", lit(seed), lit(tag), col("id"))), 1, 8), 16, 10)
      .cast("long")

  /** n weighted ops as rows (i, op, key, name, acctbal, ts):
    * op mix 50/30/20 c/u/d (ref weights), keys uniform over [0, keySpace)
    * so updates and deletes usually land on live rows, ts strictly
    * monotone in i so the stream has one deterministic final state.
    */
  def ops(spark: SparkSession, n: Long, keySpace: Long, seed: Long): DataFrame = {
    require(n > 0 && keySpace > 0)
    val u = h(seed, "op") % 100
    spark.range(n)
      .withColumn("op", when(u < 50, "c").when(u < 80, "u").otherwise("d"))
      .withColumn("key", h(seed, "key") % keySpace)
      .withColumn("name", concat(lit("cust_"), col("key"), lit("_"), col("id")))
      .withColumn("acctbal", (h(seed, "bal") % 1000000).cast("double") / 100.0)
      .withColumn("ts", lit(BaseTs) + col("id"))
      .select(col("id").as("i"), col("op"), col("key"), col("name"),
        col("acctbal"), col("ts"))
  }

  /** The op stream rendered as full Debezium envelopes in the customer
    * shape (same schema block as [[ChangelogGen]]), ready for the parse ->
    * flatten -> dedup -> merge stack or a file/Kafka-shaped source.
    */
  def envelopes(spark: SparkSession, n: Long, keySpace: Long, seed: Long): DataFrame = {
    val o = ops(spark, n, keySpace, seed)
    def image(name: Column, bal: Column): Column = struct(
      col("key").as("c_custkey"),
      name.as("c_name"),
      lit(7).as("c_nationkey"),
      bal.as("c_acctbal"),
      lit("SYNTH").as("c_mktsegment"))
    // before-images for u/d reference the prior version only nominally
    // (a "_prev" rendering) — the merge stack never reads them for state
    val after  = when(col("op") =!= "d", image(col("name"), col("acctbal")))
    val before = when(col("op").isin("u", "d"),
      image(concat(col("name"), lit("_prev")), col("acctbal") - 1.0))
    val source = struct(
      lit("2.2").as("version"), lit("postgresql").as("connector"),
      lit("graft").as("name"), col("ts").as("ts_ms"), lit("postgres").as("db"),
      lit("public").as("schema"), lit("customer").as("table"))
    val payload = struct(
      before.as("before"), after.as("after"), source.as("source"),
      col("op").as("op"), col("ts").as("ts_ms"),
      lit(null).cast("string").as("transaction"))
    val schemaBlock = Envelope.schemaBlockJson(ChangelogGen.customerFields)
    o.select(
      concat(lit(s"""{"schema":$schemaBlock,"payload":"""),
        to_json(payload), lit("}")).as("value"),
      col("ts").as(Changelog.SeqCol))
  }
}
