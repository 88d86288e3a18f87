package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. Companion to
  * [[Dedup.dedupClusters]] (connected components): same iterative
  * discipline — ids-only traffic, an eager `localCheckpoint` per round so
  * the plan does not grow exponentially with iterations — applied to
  * PageRank's fixed-iteration-count shape.
  */
object Graph {
  /** PageRank with damping 0.85 over `edges(src, dst)` (long node ids;
    * parallel edges count as distinct links), `iters` fixed iterations.
    *
    * All arithmetic is INTEGER: ranks live in units of 1e-12 (`Scale`),
    * per-edge contributions are floor divisions by out-degree, and the
    * damping step is `(85 * sum) DIV 100`. Integer sums are
    * order-independent, so the result is bit-identical on any partitioning
    * AND in any other engine that mirrors the formula — which is what puts
    * an iterative float-free PageRank under the exact-match oracle gate.
    * (A double-arithmetic PageRank would drift by summation order and
    * could only ever get a rows-only check.)
    *
    * Scale shape per iteration: one shuffle join edges-to-ranks on `src`
    * and one `dst`-keyed aggregation — the canonical two-shuffle
    * distributed PageRank round. The edge table is hash-partitioned by
    * `src` ONCE and persisted, so each round reshuffles only the
    * rank vector (O(nodes)), never the edge list (O(edges)); dangling-node
    * mass (nodes with no out-edges) is dropped, the standard simplification
    * when the input graph guarantees positive out-degree.
    */
  val Scale = 1000000000000L // 1e12: rank units of 1e-12

  def pageRank(edges: DataFrame, iters: Int, nPartitions: Int = 0): DataFrame = {
    val parts = if (nPartitions > 0) nPartitions
      else edges.sparkSession.sparkContext.defaultParallelism
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(parts, col("src")).persist()
    try {
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("_deg"))
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .localCheckpoint(true)
      val n = nodes.count()
      val base = (Scale * 15L) / (100L * n) // (1-d)/n, floored once
      val pr0 = Scale / n
      var pr = nodes.withColumn("pr", lit(pr0))
      for (_ <- 1 to iters) {
        val contrib = e.join(pr, e("src") === pr("id"))
          .join(outdeg, "src")
          .select(col("dst"), expr("pr DIV _deg").as("_c"))
        val sums = contrib.groupBy(col("dst")).agg(sum(col("_c")).as("_s"))
        pr = nodes.join(sums, nodes("id") === sums("dst"), "left")
          .select(nodes("id"),
            (lit(base) + expr("85 * coalesce(_s, 0L) DIV 100")).as("pr"))
          .localCheckpoint(true) // truncate lineage: O(1) plan per round
      }
      pr
    } finally e.unpersist()
  }
}
