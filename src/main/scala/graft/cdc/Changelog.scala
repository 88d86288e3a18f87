package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stateless changelog transforms — the per-batch dataflow of the CDC engine.
  *
  * Each step is a pure `DataFrame => DataFrame`, declared with the Column API
  * so Catalyst fuses the whole chain into one WholeStageCodegen span: parse
  * (ref: cdc_stream.py:580), generated flatten projection (:264-304,589),
  * key extraction (:592-596) and the keyed argmax dedup that is the heart of
  * the reference engine (:598-616; worked example docs/howitworks.txt:1-24).
  *
  * Scale notes (100 TB discipline):
  *   - parse+flatten+key are narrow (no shuffle); they pipeline with the scan.
  *   - dedupLatest is ONE hash-partition shuffle on the key with map-side
  *     partial aggregation (max_by is a declarative agg, so Catalyst plans
  *     partial+final automatically) — batch of N events collapses to <=1 row
  *     per key before any join against the big snapshot.
  *   - nothing here ever collects to the driver.
  */
object Changelog {
  val OpCol  = "operation"
  val TsCol  = "timestamp"
  val KeyCol = "key_value"
  /** Within-batch arrival order, the tie-breaker the reference lacks
    * (SURVEY §4 hazard 2: equal ts_ms resolve arbitrarily via max_by).
    * Kafka offset in production; monotonic id in tests.
    */
  val SeqCol = "_seq"

  /** P1+P2: raw event bytes/string -> typed envelope struct column `data`. */
  def parse(raw: DataFrame, envelope: StructType): DataFrame = {
    val cols = raw.columns.filter(_ != "value").map(col).toSeq :+
      from_json(col("value").cast("string"), envelope).as("data")
    raw.select(cols: _*)
  }

  /** P3+P4: `payload.before.f`/`payload.after.f` -> `before_f`/`after_f` for
    * every field (optionally pruned to `columnsToSave`, order preserved),
    * plus `op -> operation`, `ts_ms -> timestamp`. Tombstones / events that
    * failed to parse have a null op and are dropped (P5).
    */
  def flatten(parsed: DataFrame, fields: Seq[String],
              columnsToSave: Option[Seq[String]] = None): DataFrame = {
    val keep = columnsToSave match {
      case Some(saved) => fields.filter(saved.contains) // preserve field order
      case None        => fields
    }
    val passThrough = parsed.columns.filter(_ != "data").map(col).toSeq
    val cols = passThrough ++
      keep.map(f => col(s"data.payload.before.$f").as(s"before_$f")) ++
      keep.map(f => col(s"data.payload.after.$f").as(s"after_$f")) ++
      Seq(col("data.payload.op").as(OpCol), col("data.payload.ts_ms").as(TsCol))
    parsed.select(cols: _*).filter(col(OpCol).isNotNull)
  }

  /** P7: key = before-image key for deletes, after-image key otherwise.
    * Explicit `.otherwise` closes the reference's null-key hole
    * (SURVEY §4 hazard 4).
    */
  def withKey(df: DataFrame, keyField: String): DataFrame =
    df.withColumn(KeyCol,
      when(col(OpCol) === "d", col(s"before_$keyField"))
        .otherwise(col(s"after_$keyField")))

  /** A1, the core operator: per key keep the whole event with max
    * (timestamp[, seq]) — collapses N events per key to the net change.
    * Implemented with built-in `max_by` over a struct ordering (lexicographic
    * struct comparison gives the (ts, seq) tie-break). SQL-oracle equivalent:
    * `row_number() over (partition by key order by ts desc[, seq desc]) = 1`.
    */
  def dedupLatest(df: DataFrame): DataFrame = {
    val dataCols = df.columns.filterNot(c => c == KeyCol).toSeq
    val ordering =
      if (df.columns.contains(SeqCol)) struct(col(TsCol), col(SeqCol))
      else struct(col(TsCol))
    df.filter(col(KeyCol).isNotNull)
      .groupBy(col(KeyCol))
      .agg(max_by(struct(dataCols.map(col): _*), ordering).as("_latest"))
      .select(col(KeyCol) +: dataCols.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** T8 dead-letter side output (claimed in ref README.md:122-127 but never
    * implemented — errors just log+raise, cdc_stream.py:703-705): events
    * whose envelope fails to parse (malformed JSON, missing payload/op).
    */
  def deadLetters(raw: DataFrame, envelope: StructType): DataFrame = {
    val parsed = from_json(col("value").cast("string"), envelope)
    raw.filter(col("value").isNotNull && parsed.getField("payload").getField("op").isNull)
  }

  /** Full per-batch pipeline: parse -> flatten -> key -> dedup. */
  def netChanges(raw: DataFrame, fields: Seq[Envelope.FieldInfo], keyField: String,
                 columnsToSave: Option[Seq[String]] = None): DataFrame = {
    val env = Envelope.envelopeSchema(Envelope.recordSchema(fields))
    dedupLatest(withKey(flatten(parse(raw, env), fields.map(_.name), columnsToSave), keyField))
  }

  /** P12: final table shape — `after_f` -> `f` plus the audit timestamp
    * (ref: cdc_stream.py:635-638 adds `timestamp` to the target table).
    */
  def afterImage(df: DataFrame, fields: Seq[String]): DataFrame =
    df.select(fields.map(f => col(s"after_$f").as(f)) :+ col(TsCol).as("last_ts"): _*)
}
