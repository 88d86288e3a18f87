package graft.cdc

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val nan = Double.NaN

  test("diff reports missing, extra, and first-mismatched-column rows") {
    val src = Seq(
      (1L, "a", 10.0),   // unchanged
      (2L, "b", 20.0),   // missing in target
      (3L, "c", 30.0),   // name AND balance differ -> first column (name) wins
      (4L, "d", 40.0))   // balance differs
      .toDF("id", "name", "bal")
    val tgt = Seq(
      (1L, "a", 10.0),
      (3L, "C", 31.0),
      (4L, "d", 41.0),
      (9L, "z", 90.0))   // extra in target
      .toDF("id", "name", "bal")
    val out = Validate.diff(src, tgt, "id")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.getString(2)),
        Option(r.getString(3)), Option(r.getString(4)))).toSet
    assert(out == Set(
      ("missing", Some(2L), None, None, None),
      ("extra", Some(9L), None, None, None),
      ("mismatch", Some(3L), Some("name"), Some("c"), Some("C")),
      ("mismatch", Some(4L), Some("bal"), Some("40.0"), Some("41.0"))))
  }

  test("diff tolerates NaN==NaN and null==null; flags null vs value") {
    val src = Seq((1L, Some(nan)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "bal")
    val tgt = Seq((1L, Some(nan)), (2L, None), (3L, Option.empty[Double]))
      .toDF("id", "bal")
    val out = Validate.diff(src, tgt, "id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("mismatch"))
    assert(out.head.getLong(1) == 3L && out.head.getString(3) == "3.0"
      && out.head.getString(4) == null)
  }

  test("diff emits column-level drift rows and ignores ignored columns") {
    val src = Seq((1L, "a", "seg")).toDF("id", "name", "seg")
    val tgt = Seq((1L, "a", "t0")).toDF("id", "name", "loaded_at")
    val out = Validate.diff(src, tgt, "id", ignore = Set("loaded_at"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    // loaded_at ignored -> no column_extra for it; seg only in source
    assert(out == Set(("column_missing", "seg")))
  }

  test("reserved output names are rejected unless ignored") {
    val src = Seq((1L, "a")).toDF("id", "kind")
    val tgt = Seq((1L, "a")).toDF("id", "kind")
    intercept[IllegalArgumentException](Validate.diff(src, tgt, "id"))
    // ignoring the colliding column makes the diff legal again
    assert(Validate.diff(src, tgt, "id", ignore = Set("kind")).count() == 0)
    val pfx = Seq((1L, "a")).toDF("id", "_t_x")
    intercept[IllegalArgumentException](Validate.diff(pfx, pfx, "id"))
  }

  test("summary counts schema drift as inconsistency") {
    val src = Seq((1L, "a", "s")).toDF("id", "name", "seg")
    val tgt = Seq((1L, "a")).toDF("id", "name")
    val s = Validate.summary(Validate.diff(src, tgt, "id")).collect().head
    assert(s.getLong(s.fieldIndex("n_column_missing")) == 1L)
    assert(!s.getBoolean(s.fieldIndex("is_consistent")))
  }

  test("summary rolls counts up and reports consistency") {
    val src = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val same = Validate.summary(Validate.diff(src, src, "id")).collect().head
    assert(same.getBoolean(same.fieldIndex("is_consistent")))
    val tgt = Seq((1L, "a")).toDF("id", "name")
    val drift = Validate.summary(Validate.diff(src, tgt, "id")).collect().head
    assert(drift.getLong(drift.fieldIndex("n_missing")) == 1L)
    assert(!drift.getBoolean(drift.fieldIndex("is_consistent")))
  }
}
