package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqlHistorySpec extends SparkSpec {
  import spark.implicits._

  val fields = Seq(
    Envelope.FieldInfo("id", "string", optional = false),
    Envelope.FieldInfo("name", "string"),
    Envelope.FieldInfo("bal", "double"))

  private def fl(op: String, id: String, name: String, bal: Option[Double]) =
    Seq((id, op, 1L, if (op == "d") None else Option(id),
      if (op == "d") None else Option(name), if (op == "d") None else bal))
      .toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
        "after_id", "after_name", "after_bal")

  private def sqlOf(df: org.apache.spark.sql.DataFrame): String =
    SqlHistory.fromFlattened(df, "t", fields, "id")
      .select("sql_text").as[String].head()

  test("string keys are quoted in UPDATE/DELETE WHERE clauses") {
    assert(sqlOf(fl("d", "abc", "x", None)) == "DELETE FROM t WHERE id = 'abc';")
    assert(sqlOf(fl("u", "abc", "n", Some(1.5))) ==
      "UPDATE t SET name = 'n', bal = 1.50 WHERE id = 'abc';")
  }

  test("embedded quotes double up (SQL escape, ref format_sql_value)") {
    assert(sqlOf(fl("d", "o'brien", "x", None)) ==
      "DELETE FROM t WHERE id = 'o''brien';")
    assert(sqlOf(fl("c", "k1", "o'b", Some(2.0))) ==
      "INSERT INTO t (id, name, bal) VALUES ('k1', 'o''b', 2.00);")
  }

  test("NULL values render as literal NULL") {
    assert(sqlOf(fl("c", "k2", null, Some(1.0))) ==
      "INSERT INTO t (id, name, bal) VALUES ('k2', NULL, 1.00);")
  }
}
