package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Golden dedup semantics from the reference's worked example
  * (docs/howitworks.txt:1-24): a c,u,u,d,c sequence on one key nets to the
  * final c.
  */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  val fields = Seq(
    Envelope.FieldInfo("id", "int64", optional = false),
    Envelope.FieldInfo("name", "string"))

  private def event(op: String, id: Long, name: String, ts: Long): String = {
    val img = s"""{"id":$id,"name":"$name"}"""
    val before = if (op == "u" || op == "d") img else "null"
    val after = if (op == "d") "null" else img
    s"""{"schema":${Envelope.schemaBlockJson(fields)},"payload":{"before":$before,"after":$after,"source":{"connector":"postgresql","table":"t","ts_ms":$ts},"op":"$op","ts_ms":$ts,"transaction":null}}"""
  }

  private def pipeline(events: Seq[String]) = {
    val raw = events.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("value", Changelog.SeqCol)
    Changelog.netChanges(raw, fields, "id")
  }

  test("howitworks golden sequence: c,u,u,d,c on one key nets to final c") {
    val net = pipeline(Seq(
      event("c", 1, "a", 100), event("u", 1, "b", 200), event("u", 1, "c", 300),
      event("d", 1, "c", 400), event("c", 1, "d", 500)))
    val rows = net.select("key_value", Changelog.OpCol, "after_name").collect()
    assert(rows.toSeq == Seq(Row(1L, "c", "d")))
  }

  test("delete as final event keeps the delete (before-image key)") {
    val net = pipeline(Seq(event("c", 2, "x", 100), event("d", 2, "x", 200)))
    val rows = net.select("key_value", Changelog.OpCol).collect()
    assert(rows.toSeq == Seq(Row(2L, "d")))
  }

  test("equal ts_ms ties break on arrival order (_seq), not arbitrarily") {
    // reference hazard (SURVEY §4.2): same-millisecond events
    val net = pipeline(Seq(
      event("c", 3, "first", 100), event("u", 3, "second", 100)))
    assert(net.select("after_name").as[String].collect().toSeq == Seq("second"))
  }

  test("tombstones / unparseable events are dropped, not nulled in") {
    val raw = (Seq(event("c", 4, "ok", 1)) ++ Seq("not json", """{"payload":null}"""))
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("value", Changelog.SeqCol)
    val net = Changelog.netChanges(raw, fields, "id")
    assert(net.count() == 1)
  }

  test("columnsToSave prunes flattened columns but preserves field order") {
    val raw = Seq((event("c", 5, "n", 1), 0L)).toDF("value", Changelog.SeqCol)
    val net = Changelog.netChanges(raw, fields, "id", columnsToSave = Some(Seq("id")))
    assert(!net.columns.contains("after_name") && net.columns.contains("after_id"))
  }
}
