package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-analytics operators over keyed, timestamped streams: ordered-step
  * funnels, cohort retention, time-grid gap filling, and RANGE-frame rolling
  * statistics. Timestamps are epoch longs (any unit); periods are expressed
  * in the same unit.
  *
  * Scale design: every stage is keyed by the entity column or the period —
  * no event self-joins, no per-entity collects, no calendar cross joins;
  * period indices use true FLOOR division (subtract the non-negative pmod
  * first) so pre-epoch timestamps bucket identically to an external
  * engine's flooring integer division.
  */
object Analytics {

  /** Floor-division period index of an epoch-long column. The division
    * runs in DECIMAL: Spark's `/` on longs is IEEE-double division, and an
    * epoch-ns numerator (~1.7e18 > 2^53) is only double-exact when the
    * period length carries a large power-of-two factor — decimal division
    * of the exact multiple is unit-independent (the numerator is divisible
    * by construction, so the quotient is an exact integer).
    */
  def periodOf(ts: Column, periodLen: Long): Column = {
    val exactMultiple = (ts - pmod(ts, lit(periodLen))).cast(DecimalType(38, 0))
    (exactMultiple / lit(periodLen).cast(DecimalType(20, 0))).cast("long")
  }

  /** Ordered-step funnel: each stage's earliest qualifying time chains off
    * the previous stage's (min ts of `stepType` at-or-after the prior
    * step). One entity-keyed aggregate + join per stage — shuffle reuse
    * across stages, no event self-join. Returns ONE row: `n_users` (total
    * distinct entities) followed by one count per step, named by the
    * caller via (eventType, outName) pairs.
    */
  def funnel(events: DataFrame, keyCol: String, typeCol: String, tsCol: String,
             steps: Seq[(String, String)]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val reserved = steps.indices.map(i => s"_t$i") :+ "n_users"
    require(!reserved.exists(events.columns.contains),
      s"funnel reserves the column names ${reserved.mkString(", ")}")
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, ((etype, _), i)) =>
        val base = prev match {
          case None =>
            events.filter(col(typeCol) === etype)
          case Some(p) =>
            events.join(p, Seq(keyCol))
              .filter(col(typeCol) === etype && col(tsCol) >= col(s"_t${i - 1}"))
        }
        Some(base.groupBy(keyCol).agg(min(col(tsCol)).as(s"_t$i")))
    }.flatten
    val counts = events.agg(countDistinct(col(keyCol)).as("n_users"))
    stages.zip(steps).foldLeft(counts) { case (acc, (stage, (_, outName))) =>
      acc.crossJoin(stage.agg(count(lit(1)).as(outName)))
    }
  }

  /** Cohort retention: entities cohort by their first-activity period;
    * each (cohort_w, week_offset) counts distinct entities active that
    * period. Events collapse to entity-periods BEFORE the join, so
    * everything downstream runs at activity grain. (Output names say "w"
    * for the common weekly case; the period length is whatever the caller
    * passes.)
    */
  def retention(events: DataFrame, keyCol: String, tsCol: String,
                periodLen: Long): DataFrame = {
    val reserved = Seq("w", "cohort_w", "week_offset", "n_users")
    require(!reserved.exists(events.columns.contains),
      s"retention reserves the column names ${reserved.mkString(", ")}")
    val p = periodOf(col(tsCol), periodLen)
    val firstP = events.groupBy(keyCol).agg(min(p).as("cohort_w"))
    events.select(col(keyCol), p.as("w")).distinct()
      .join(firstP, Seq(keyCol))
      .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("week_offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }

  /** Time-grid resample + forward fill: a per-entity period grid from each
    * entity's first to last active period (sequence explode — grid size
    * proportional to real spans), left-joined to the per-period aggregate,
    * gaps forward-filled with a last(ignoreNulls) window. Output:
    * (keyCol, h, filled_value, is_gap).
    */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              periodLen: Long, periodAgg: Column): DataFrame = {
    val reserved = Seq("h", "h0", "h1", "hour_value", "filled_value", "is_gap")
    require(!reserved.exists(events.columns.contains),
      s"gapFill reserves the column names ${reserved.mkString(", ")}")
    val p = periodOf(col(tsCol), periodLen)
    val perPeriod = events.groupBy(col(keyCol), p.as("h"))
      .agg(periodAgg.as("hour_value"))
    val span = events.groupBy(col(keyCol))
      .agg(min(p).as("h0"), max(p).as("h1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("h0"), col("h1"))).as("h"))
    val w = Window.partitionBy(keyCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perPeriod, Seq(keyCol, "h"), "left")
      .withColumn("filled_value", last(col("hour_value"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("hour_value").isNull.cast("int"))
      .select(col(keyCol), col("h"), col("filled_value"), col("is_gap"))
  }

  /** Trailing rolling mean over SPARSE per-period sums via a RANGE window
    * frame (value-based bounds on the period index). Sums accumulate in
    * exact decimal; the mean surfaces FIXED-POINT (x10^4, integer floor
    * division) — a float round() of the quotient sits on rounding
    * boundaries that differ by 1 ulp across engines. Output:
    * (keyCol, h, hour_sum, mean_24h_e4, n_window).
    */
  def rollingMean(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, periodLen: Long, trailing: Int): DataFrame = {
    val reserved = Seq("h", "sdec", "hour_sum", "mean_24h_e4", "n_window", "_s4")
    require(!reserved.exists(events.columns.contains),
      s"rollingMean reserves the column names ${reserved.mkString(", ")}")
    val p = periodOf(col(tsCol), periodLen)
    val perPeriod = events.groupBy(col(keyCol), p.as("h"))
      .agg(sum(col(valueCol).cast(DecimalType(20, 2))).as("sdec"))
    val w = Window.partitionBy(keyCol).orderBy("h").rangeBetween(-trailing, 0)
    perPeriod.select(col(keyCol), col("h"),
      round(col("sdec").cast("double"), 2).as("hour_sum"),
      (sum(col("sdec")).over(w) * 10000).cast("long").as("_s4"),
      count(lit(1)).over(w).cast("long").as("n_window"))
      // FLOOR division (subtract the non-negative pmod first): bare DIV
      // truncates toward zero and diverges from the oracle's flooring //
      // when the rolling sum is negative
      .withColumn("mean_24h_e4", expr("(_s4 - pmod(_s4, n_window)) DIV n_window"))
      .select(col(keyCol), col("h"), col("hour_sum"), col("mean_24h_e4"),
        col("n_window"))
  }
}
