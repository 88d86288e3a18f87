package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-items profiling on bounded state — driver API over the native
  * [[graft.functions.MisraGries]] aggregate (registered as `misra_gries`
  * by [[graft.GraftExtensions]]).
  *
  * Why not exact `GROUP BY item ORDER BY count DESC LIMIT k`: exact top-k
  * shuffles one row per DISTINCT item — on a 100 TB corpus with an
  * unbounded key universe (URLs, user ids, shingles) that is itself a
  * terabyte-scale shuffle. The sketch keeps k-1 counters per partial
  * buffer and merges associatively, so the shuffle moves O(k) bytes per
  * partition however large the universe.
  */
object HeavyHitters {
  /** One-row summary: the Misra-Gries array of (item, est) plus n. */
  def summary(df: DataFrame, item: Column, k: Int): DataFrame =
    df.agg(call_function("misra_gries", item, lit(k)).as("hh"),
      count(lit(1)).as("n"))

  /** Per-item verdict on the sketch's two theorems, computed against exact
    * counts: every item with true_cnt > n/k must be present, and every
    * estimate must undercount by at most n/k. All-integer comparisons
    * (`cnt * k` vs `n`), so the result is deterministic under any
    * partitioning even though the estimates themselves are merge-order
    * dependent — which is what lets an approximate operator sit under the
    * exact-match oracle gate.
    */
  def evalGuarantees(df: DataFrame, item: Column, k: Int): DataFrame = {
    // the summary row is O(k) — collecting it is broadcast-variable setup
    // (same discipline as the centroid/hyperplane collects), and inlining
    // the estimates as a map literal keeps the exact side to ONE pass
    val row = summary(df, item, k).collect()(0)
    val n = row.getLong(1)
    val ests: Map[String, Long] = row.getSeq[org.apache.spark.sql.Row](0)
      .map(e => e.getString(0) -> e.getLong(1)).toMap
    val estOf =
      if (ests.isEmpty) lit(null).cast("long")
      else element_at(typedLit(ests), col("item"))
    df.groupBy(item.as("item")).agg(count(lit(1)).as("true_cnt"))
      .filter(col("true_cnt") * k > n) // true heavy hitters only
      .withColumn("est", estOf)
      .select(col("item"), col("true_cnt"),
        col("est").isNotNull.as("in_sketch"),
        (col("est").isNotNull && col("est") <= col("true_cnt") &&
          (col("true_cnt") - col("est")) * k <= n).as("est_within_bound"))
  }
}
