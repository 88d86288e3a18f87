package graft.functions

import graft.cdc.MongoChangelog
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native-expression form of the recursive BSON extended-JSON normalizer
  * (ref: cdc_stream.py:427-497): string doc -> map<string,string> with
  * `$oid`/`$date`/`$number*`/`$binary`/`$regex` wrappers unwrapped.
  *
  * Versus the Scala UDF wrapper this skips the ScalaUDF conversion layer
  * (encoder round-trip per row) and writes Catalyst MapData directly.
  * Codegen for a recursive JSON walk buys nothing, so this is a deliberate
  * CodegenFallback — the surrounding projection still codegens.
  */
case class BsonNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bson_normalize expects a string document, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val m = MongoChangelog.normalizeDocument(input.asInstanceOf[UTF8String].toString)
    if (m == null) null
    else {
      val keys = new Array[Any](m.size)
      val values = new Array[Any](m.size)
      var i = 0
      m.foreach { case (k, v) =>
        keys(i) = UTF8String.fromString(k)
        values(i) = if (v == null) null else UTF8String.fromString(v)
        i += 1
      }
      ArrayBasedMapData(keys, values)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BsonNormalize =
    copy(child = newChild)

  override def prettyName: String = "bson_normalize"
}
