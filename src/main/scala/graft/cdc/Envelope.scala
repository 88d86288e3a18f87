package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Debezium changelog envelope: data model + dynamic-schema machinery.
  *
  * Spark-first rebuild (not a port) of the reference engine's schema layer:
  *   - the Debezium-primitive -> Spark type map
  *     (ref: spark_client/src/cdc_stream.py:162-182),
  *   - schema inference from the first raw event's embedded `schema.fields`
  *     block (ref: cdc_stream.py:184-262),
  *   - the infer-once / cache-forever schema cache
  *     (ref: cdc_stream.py:501-541) realized with Spark's own
  *     `DataType.json` / `DataType.fromJson` round-trip.
  *
  * Everything here is driver-side metadata work: O(1) per stream, never per
  * row, so it is scale-independent by construction.
  */
object Envelope {

  /** One source column: name + Debezium primitive type + nullability.
    * Order matters — generated projections must be order-stable
    * (ref relies on field_info order, cdc_stream.py:264-304).
    */
  final case class FieldInfo(name: String, dbzType: String, optional: Boolean = true)

  /** Debezium primitive -> Spark type (ref: cdc_stream.py:162-182;
    * unknown types fall back to string, :182).
    */
  def sparkType(dbz: String): DataType = dbz match {
    case "int8" | "int16" | "int32" => IntegerType
    case "int64"                    => LongType
    case "float"                    => FloatType
    case "double"                   => DoubleType
    case "boolean"                  => BooleanType
    case "string"                   => StringType
    case "bytes"                    => BinaryType
    case "decimal"                  => DecimalType(38, 18)
    case _                          => StringType
  }

  /** True when a column can evolve `from` -> `to` LOSSLESSLY in place —
    * Delta's type-widening matrix: within-family (same Spark type, e.g.
    * int8 -> int32), int -> long, int -> double, float -> double. Spark
    * 4's parquet reader upcasts these at scan time, so files written
    * under the narrow type stay byte-identical and read correctly
    * through the widened schema. Everything else (narrowing, cross-family
    * like int64 -> string) is NOT a widening — the stream rejects it
    * loudly instead of parsing overflow values to silent nulls.
    */
  def isLosslessWidening(from: String, to: String): Boolean =
    (sparkType(from), sparkType(to)) match {
      case (a, b) if a == b                     => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType)              => true
      case _                                    => false
    }

  /** Inverse map, used when synthesizing envelopes from an existing Spark
    * schema (test fixtures, changelog generator).
    */
  def dbzType(t: DataType): String = t match {
    case ByteType | ShortType | IntegerType => "int32"
    case LongType                           => "int64"
    case FloatType                          => "float"
    case DoubleType                         => "double"
    case BooleanType                        => "boolean"
    case BinaryType                         => "bytes"
    case _: DecimalType                     => "decimal"
    case _                                  => "string"
  }

  def fieldInfo(schema: StructType): Seq[FieldInfo] =
    schema.fields.toSeq.map(f => FieldInfo(f.name, dbzType(f.dataType), f.nullable))

  /** Spark schema of the source record (before/after image). */
  def recordSchema(fields: Seq[FieldInfo]): StructType =
    StructType(fields.map(f => StructField(f.name, sparkType(f.dbzType), nullable = true)))

  /** Debezium `source` block — we model the common connector fields
    * (ref sample events: archive/change_data_capture_problem_statement.md:30-104).
    */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType)))

  /** Full envelope schema `{payload: {before, after, source, op, ts_ms, transaction}}`.
    * The `schema` block of the raw JSON is deliberately NOT parsed per-row —
    * it is only consulted once, at inference time (the reference does the
    * same: cdc_stream.py:573-577).
    */
  def envelopeSchema(record: StructType): StructType =
    StructType(Seq(StructField("payload", StructType(Seq(
      StructField("before", record),
      StructField("after", record),
      StructField("source", sourceSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("transaction", StringType))))))

  /** The JSON text of the Debezium `schema` block for a record — embedded in
    * generated events so the inference path has something real to read.
    * Serialized with Jackson so field names containing quotes/backslashes
    * stay well-formed JSON.
    */
  def schemaBlockJson(fields: Seq[FieldInfo]): String = {
    val m = new ObjectMapper()
    def fj(f: FieldInfo) = {
      val n = m.createObjectNode()
      n.put("field", f.name); n.put("type", f.dbzType); n.put("optional", f.optional)
      n
    }
    val rec = m.createArrayNode()
    fields.foreach(f => rec.add(fj(f)))
    def block(name: String) = {
      val n = m.createObjectNode()
      n.put("field", name); n.put("type", "struct"); n.put("optional", true)
      n.set[com.fasterxml.jackson.databind.node.ObjectNode]("fields", rec)
      n
    }
    val root = m.createObjectNode()
    root.put("type", "struct")
    val fs = m.createArrayNode()
    fs.add(block("before")); fs.add(block("after"))
    root.set[com.fasterxml.jackson.databind.node.ObjectNode]("fields", fs)
    m.writeValueAsString(root)
  }

  /** Infer the source-record field list from ONE raw event's embedded
    * `schema.fields` block (ref: cdc_stream.py:184-262). Driver-side, once
    * per stream; the per-row path never touches Jackson.
    */
  def inferFieldInfo(rawEvent: String): Seq[FieldInfo] = {
    val root = new ObjectMapper().readTree(rawEvent)
    val blocks = root.path("schema").path("fields").elements().asScala.toSeq
    val rec = blocks.find(b => { val f = b.path("field").asText(); f == "before" || f == "after" })
      .getOrElse(throw new IllegalArgumentException(
        "event has no schema.fields before/after block; cannot infer schema"))
    rec.path("fields").elements().asScala.toSeq.map { f =>
      FieldInfo(f.path("field").asText(), f.path("type").asText("string"),
        f.path("optional").asBoolean(true))
    }
  }

  // ---------------------------------------------------------------- cache

  /** Persist inferred schema + field order so restarts skip inference
    * (ref: cdc_stream.py:501-541 caches schema.json + field_info.json).
    * Atomic write (tmp + move) so a crash never leaves a torn cache.
    */
  def saveCache(dir: String, fields: Seq[FieldInfo]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val m = new ObjectMapper()
    val arr = m.createArrayNode()
    fields.foreach { f =>
      val n = m.createObjectNode()
      n.put("name", f.name); n.put("dbzType", f.dbzType); n.put("optional", f.optional)
      arr.add(n)
    }
    atomicWrite(d.resolve("field_info.json"), m.writeValueAsString(arr))
    atomicWrite(d.resolve("schema.json"), envelopeSchema(recordSchema(fields)).json)
  }

  def loadCache(dir: String): Option[Seq[FieldInfo]] = {
    val p = Paths.get(dir, "field_info.json")
    if (!Files.exists(p)) None
    else {
      val root = new ObjectMapper().readTree(Files.readString(p))
      Some(root.elements().asScala.toSeq.map { f =>
        FieldInfo(f.path("name").asText(), f.path("dbzType").asText(),
          f.path("optional").asBoolean(true))
      })
    }
  }

  /** Cached envelope schema via Spark's own DataType JSON round-trip. */
  def loadCachedSchema(dir: String): Option[StructType] = {
    val p = Paths.get(dir, "schema.json")
    if (!Files.exists(p)) None
    else DataType.fromJson(Files.readString(p)) match {
      case s: StructType => Some(s)
      case _             => None
    }
  }

  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
