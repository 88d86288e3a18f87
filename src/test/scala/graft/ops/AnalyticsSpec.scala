package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, ts) events; ts in plain small longs (unit-agnostic ops)
  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("u", "t", "ts")

  test("funnel: steps must happen in order; equal timestamps qualify") {
    val df = ev(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),   // full funnel
      (2L, "view", 10L), (2L, "click", 5L),                      // click BEFORE view
      (3L, "view", 10L), (3L, "click", 10L),                     // same-ts click counts
      (4L, "click", 10L), (4L, "buy", 20L))                      // never viewed
    val out = Analytics.funnel(df, "u", "t", "ts",
      Seq("view" -> "n_view", "click" -> "n_vc", "buy" -> "n_full")).collect()(0)
    assert(out.getAs[Long]("n_users") == 4L)
    assert(out.getAs[Long]("n_view") == 3L)   // users 1, 2, 3
    assert(out.getAs[Long]("n_vc") == 2L)     // 1 and 3; 2's click precedes its view
    assert(out.getAs[Long]("n_full") == 1L)   // only 1; 4 never viewed
  }

  test("retention: cohorts by first period, offsets count distinct actives") {
    val df = ev(
      (1L, "x", 0L), (1L, "x", 25L),   // cohort p0, active p0 + p2
      (2L, "x", 5L), (2L, "x", 12L),   // cohort p0, active p0 + p1
      (3L, "x", 15L))                  // cohort p1 only
    val out = Analytics.retention(df, "u", "ts", periodLen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
  }

  test("gapFill: grid spans first..last period per key, gaps forward-fill") {
    val df = Seq((1L, 0L, 1.0), (1L, 21L, 3.0), (2L, 10L, 5.0))
      .toDF("u", "ts", "v")
    val out = Analytics.gapFill(df, "u", "ts", periodLen = 10L,
        periodAgg = round(sum(col("v")), 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getInt(3)))).toMap
    // user 1: periods 0..2; period 1 is a gap carrying period 0's value
    assert(out((1L, 0L)) == ((1.0, 0)))
    assert(out((1L, 1L)) == ((1.0, 1)))
    assert(out((1L, 2L)) == ((3.0, 0)))
    assert(out((2L, 1L)) == ((5.0, 0)))
    assert(out.size == 4)
  }

  test("rollingMean: RANGE frame covers value distance, not row count") {
    // periods 0, 1, 5 for one key: at period 5 the trailing-2 frame covers
    // periods 3..5 -> only period 5's own row (sparse series!), where a
    // rowsBetween(-2, 0) frame would wrongly reach back to periods 0 and 1
    val df = Seq((1L, 0L, 10.0), (1L, 15L, 20.0), (1L, 55L, 40.0))
      .toDF("u", "ts", "v")
    val out = Analytics.rollingMean(df, "u", "ts", "v",
        periodLen = 10L, trailing = 2)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == ((100000L, 1L)))  // 10.0 -> 10_0000 fixed point
    assert(out(1L) == ((150000L, 2L)))  // mean(10, 20) = 15
    assert(out(5L) == ((400000L, 1L)))  // periods 0,1 outside the range frame
  }

  test("rollingMean floors negative sums like the oracle's // (not toward zero)") {
    // refund-style negatives: -0.01 over a single-row window -> -100 e4
    val df = Seq((1L, 0L, -0.01), (1L, 25L, 5.0)).toDF("u", "ts", "v")
    val out = Analytics.rollingMean(df, "u", "ts", "v",
        periodLen = 10L, trailing = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(0L) == -100L)
    // period 2's trailing-2 frame covers both present rows: (−0.01 + 5.00)
    // = 4.99 -> 49900 over 2 rows = 24950 (positive sanity)
    assert(out(2L) == 24950L)
    // non-divisible negative quotient: window sum -0.01 over 3 present
    // rows -> -100/3: floor = -34 (truncation toward zero would give -33,
    // diverging from DuckDB's flooring //)
    val df3 = Seq((2L, 0L, -0.01), (2L, 11L, 0.0), (2L, 22L, 0.0))
      .toDF("u", "ts", "v")
    val out3 = Analytics.rollingMean(df3, "u", "ts", "v",
        periodLen = 10L, trailing = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out3(2L) == -34L, s"floor(-100/3) must be -34, got ${out3(2L)}")
  }
}
