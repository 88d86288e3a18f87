package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K8: reconstruct source-SQL replay statements from a flattened changelog
  * (ref: archive/streaming_from_kafka_to_minio_2.py:126-131, batched
  * INSERT :242-268, UPDATE :270-327, DELETE :329-357; SQL-literal formatting
  * `format_sql_value` ref: streaming_from_kafka_to_minio.py:209-226).
  *
  * Built entirely from Column expressions (`concat`/`when`/`format_string`)
  * — one narrow projection, no driver loop, so the audit log derivation is
  * as scalable as the changelog scan itself.
  */
object SqlHistory {
  import Changelog.{KeyCol, OpCol, TsCol}

  /** Render one field value as a SQL literal. Strings are quoted with `'`
    * doubled; floating point renders with a fixed "%.2f" (deterministic
    * across engines); NULL stays literal NULL.
    */
  private def sqlLiteral(c: Column, dbzType: String): Column = {
    val rendered = dbzType match {
      case "string" | "bytes" =>
        concat(lit("'"), regexp_replace(c.cast("string"), "'", "''"), lit("'"))
      case "float" | "double" => format_string("%.2f", c)
      case _                  => c.cast("string")
    }
    when(c.isNull, lit("NULL")).otherwise(rendered)
  }

  /** One replay statement per changelog event:
    * c/r -> INSERT, u -> UPDATE, d -> DELETE. Adds a `sql_text` column.
    */
  def fromFlattened(fl: DataFrame, table: String,
                    fields: Seq[Envelope.FieldInfo], keyField: String): DataFrame = {
    val colList = fields.map(_.name).mkString(", ")
    val values = fields.map(f => sqlLiteral(col(s"after_${f.name}"), f.dbzType))
    val valueList = values.flatMap(v => Seq(lit(", "), v)).drop(1)
    // Key renders as a typed SQL literal — a string key must be quoted
    // (ref format_sql_value: streaming_from_kafka_to_minio.py:209-226).
    val keyDbz = fields.find(_.name == keyField).map(_.dbzType).getOrElse("string")
    val keyLit = sqlLiteral(col(KeyCol), keyDbz)
    val insert = concat(Seq(lit(s"INSERT INTO $table ($colList) VALUES (")) ++ valueList ++ Seq(lit(");")): _*)
    val update = concat(Seq(lit(s"UPDATE $table SET ")) ++ setParts(fields, keyField) ++
      Seq(lit(s" WHERE $keyField = "), keyLit, lit(";")): _*)
    val delete = concat(lit(s"DELETE FROM $table WHERE $keyField = "), keyLit, lit(";"))
    fl.withColumn("sql_text",
      when(col(OpCol) === "d", delete)
        .when(col(OpCol) === "u", update)
        .otherwise(insert))
  }

  private def setParts(fields: Seq[Envelope.FieldInfo], keyField: String): Seq[Column] =
    fields.filter(_.name != keyField).zipWithIndex.flatMap { case (f, i) =>
      val prefix = if (i == 0) s"${f.name} = " else s", ${f.name} = "
      Seq(lit(prefix), sqlLiteral(col(s"after_${f.name}"), f.dbzType))
    }
}
