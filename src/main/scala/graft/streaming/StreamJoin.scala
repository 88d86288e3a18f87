package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY §2.6 has only the reference's batch merge
  * joins; this is the Structured-Streaming-native two-stream operator).
  *
  * The interval join is the state-bounded formulation: both inputs carry
  * watermarks and the join condition bounds the right event-time to a
  * window around the left event-time. That pair of constraints is exactly
  * what lets Spark EVICT buffered join state — each side's rows expire once
  * the other side's watermark passes their range bound — so state is
  * O(arrival rate x (watermark delay + range width)), never O(stream
  * history). An unconstrained stream-stream equi-join would buffer both
  * streams forever.
  *
  * The same operator runs in batch (withWatermark is a no-op there), which
  * is how the driver's DuckDB oracle checks it: one code path, two
  * execution modes.
  */
object StreamJoin {

  /** Inner/outer interval join: rows pair when keys match AND
    * `rightTime` lies in [leftTime - lower, leftTime + upper].
    *
    * Column names must be disjoint between the two sides (streaming joins
    * resolve conditions by name; renaming up front keeps the output schema
    * unambiguous) — enforced here rather than silently aliased.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   leftDelay: String, rightDelay: String,
                   lower: String, upper: String,
                   joinType: String = "inner"): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    val l = left.withWatermark(leftTime, leftDelay)
    val r = right.withWatermark(rightTime, rightDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= expr(s"$leftTime - INTERVAL $lower") &&
        col(rightTime) <= expr(s"$leftTime + INTERVAL $upper"),
      joinType)
  }
}
