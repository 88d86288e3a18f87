package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import java.nio.file.Files

class EnvelopeSpec extends AnyFunSuite {
  val fields = Seq(
    Envelope.FieldInfo("id", "int64", optional = false),
    Envelope.FieldInfo("name", "string"),
    Envelope.FieldInfo("bal", "double"))

  test("debezium type map matches the reference table (cdc_stream.py:162-182)") {
    assert(Envelope.sparkType("int32") == IntegerType)
    assert(Envelope.sparkType("int64") == LongType)
    assert(Envelope.sparkType("float") == FloatType)
    assert(Envelope.sparkType("double") == DoubleType)
    assert(Envelope.sparkType("boolean") == BooleanType)
    assert(Envelope.sparkType("string") == StringType)
    assert(Envelope.sparkType("bytes") == BinaryType)
    assert(Envelope.sparkType("decimal") == DecimalType(38, 18))
    assert(Envelope.sparkType("no_such_type") == StringType) // fallback :182
  }

  test("schema inference from an embedded schema block round-trips") {
    val raw = s"""{"schema":${Envelope.schemaBlockJson(fields)},"payload":{"op":"c"}}"""
    assert(Envelope.inferFieldInfo(raw) == fields)
  }

  test("schemaBlockJson stays well-formed for hostile field names") {
    val evil = Seq(Envelope.FieldInfo("""a"b\c""", "string"))
    val raw = s"""{"schema":${Envelope.schemaBlockJson(evil)},"payload":{}}"""
    assert(Envelope.inferFieldInfo(raw) == evil) // parse fails if JSON is torn
  }

  test("schema cache round-trips field info and envelope schema") {
    val dir = Files.createTempDirectory("envcache").toString
    Envelope.saveCache(dir, fields)
    assert(Envelope.loadCache(dir).contains(fields))
    val env = Envelope.loadCachedSchema(dir).get
    assert(env == Envelope.envelopeSchema(Envelope.recordSchema(fields)))
  }

  test("cache miss yields None") {
    val dir = Files.createTempDirectory("envmiss").toString
    assert(Envelope.loadCache(dir).isEmpty)
    assert(Envelope.loadCachedSchema(dir).isEmpty)
  }
}
