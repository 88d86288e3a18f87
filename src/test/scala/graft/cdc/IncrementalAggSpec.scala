package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Incremental view maintenance: folding a changelog delta into a grouped
  * COUNT/SUM state must equal re-aggregating the merged snapshot from
  * scratch — per op kind, under group migration, and on the empty delta.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("id", "grp", "v")

  private def snapDf(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("id", "grp", "v")

  private def netDf(rows: Seq[(Long, String, Option[(String, Double)], Long)]): DataFrame =
    rows.map { case (id, op, after, ts) =>
      (id, op, after.map(_ => id), after.map(_._1), after.map(_._2), ts)
    }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_grp", "after_v",
      Changelog.TsCol)

  private def maintained(snap: DataFrame, net: DataFrame): Set[Row] =
    IncrementalAgg.maintain(IncrementalAgg.aggState(snap, "grp", "v"),
      snap, net, "id", "grp", "v")
      .select(col("grp"), col("cnt"), col("sum_val").cast("double"))
      .collect().toSet

  private def recomputed(snap: DataFrame, net: DataFrame): Set[Row] =
    IncrementalAgg.aggState(Merge.applyChanges(snap, net, "id", fields, tsGuard = false),
      "grp", "v")
      .select(col("grp"), col("cnt"), col("sum_val").cast("double"))
      .collect().toSet

  private val snap = snapDf(Seq(
    (1L, "a", 10.5), (2L, "a", 2.25), (3L, "b", 7.0)))

  test("insert, update, delete, and group migration all match the recompute") {
    val net = netDf(Seq(
      (2L, "u", Some(("a", 4.75)), 20L),  // in-place update
      (3L, "u", Some(("a", 7.0)), 20L),   // migrates b -> a
      (4L, "c", Some(("b", 1.0)), 20L),   // fresh insert
      (1L, "d", None, 20L)))              // delete
    val got = maintained(snap, net)
    assert(got == recomputed(snap, net))
    assert(got == Set(Row("a", 2L, 11.75), Row("b", 1L, 1.0)))
  }

  test("a group emptied by deletes disappears instead of lingering at cnt 0") {
    val net = netDf(Seq((3L, "d", None, 20L)))
    val got = maintained(snap, net)
    assert(got == recomputed(snap, net))
    assert(!got.exists(_.getString(0) == "b"))
  }

  test("empty delta is the identity on the state") {
    val net = netDf(Nil)
    assert(maintained(snap, net) == recomputed(snap, net))
  }

  test("delete of a key absent from the snapshot is a no-op") {
    val net = netDf(Seq((99L, "d", None, 20L)))
    assert(maintained(snap, net) == recomputed(snap, net))
  }

  test("maintainFromFeed over a manifest change feed equals the recompute") {
    // the CDF-consumer path: fold the store-derived feed (exact
    // before-images, zero table access) and compare with both the
    // snapshot-pass maintenance and the from-scratch recompute
    val st = new ManifestStore(
      java.nio.file.Files.createTempDirectory("iagg").toString, spark, "id")
    st.commit(snap, batchId = 0, nFiles = 2)
    val net = netDf(Seq(
      (2L, "u", Some(("a", 4.75)), 20L),
      (3L, "u", Some(("a", 7.0)), 20L),   // migrates b -> a
      (4L, "c", Some(("b", 1.0)), 20L),
      (1L, "d", None, 20L)))
    val stats = st.merge(net, fields, batchId = 1).get
    val feed = st.changesBetween(0L, stats.version,
      ignore = Set(Merge.LastTsCol)).get
    val got = IncrementalAgg.maintainFromFeed(
      IncrementalAgg.aggState(snap, "grp", "v"), feed, "grp", "v")
      .select(col("grp"), col("cnt"), col("sum_val").cast("double"))
      .collect().toSet
    assert(got == recomputed(snap, net))
    assert(got == Set(Row("a", 2L, 11.75), Row("b", 1L, 1.0)))
  }

  private def snapNullable(rows: Seq[(Long, Option[String], Option[Double])]): DataFrame =
    rows.toDF("id", "grp", "v")

  test("NULL group values are one group, not two (null-safe state join)") {
    val s = snapNullable(Seq(
      (1L, None, Some(3.0)), (2L, None, Some(4.0)), (3L, Some("a"), Some(1.0))))
    val net = netDf(Seq((2L, "d", None, 20L)))
    val got = maintained(s, net)
    assert(got == recomputed(s, net))
    assert(got.count(_.isNullAt(0)) == 1) // exactly ONE null-group row
  }

  test("a group drained of non-null values reports SUM as NULL, like SQL") {
    val s = snapNullable(Seq(
      (1L, Some("a"), Some(5.5)), (2L, Some("a"), None), (3L, Some("b"), None)))
    // delete the only non-null contributor of group a
    val net = netDf(Seq((1L, "d", None, 20L)))
    val got = maintained(s, net)
    assert(got == recomputed(s, net))
    // both groups survive with cnt>0 and a NULL sum
    assert(got.forall(r => r.isNullAt(2)))
  }
}
