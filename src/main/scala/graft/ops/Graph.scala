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

  /** Exact triangle census (plus node/edge/wedge counts) of the
    * UNDIRECTED graph underlying `edges` — self-loops dropped, parallel
    * and reversed duplicates collapsed.
    *
    * Counting uses degree-ordered orientation (the "forward" algorithm,
    * Schank & Wagner 2005): each undirected edge points from its
    * lower-(degree, id) endpoint to the higher, wedges fan out only at a
    * triangle's LOWEST-rank vertex, and the closing edge is looked up in
    * the same oriented set. A naive wedge join fans out O(deg^2) pairs at
    * every hub — a single celebrity node in a social graph generates
    * billions of wedges; orientation bounds the fan-out by each vertex's
    * count of HIGHER-rank neighbors (O(sqrt(edges)) on any graph), which
    * is the difference between a triangle count that finishes at 100 TB
    * and one that doesn't. Joins are equi-joins on vertex ids (hash
    * partitioned); the rank tiebreak rides as a post-join filter.
    *
    * Returns one row: (n_nodes, n_edges, n_wedges, n_triangles) — all
    * exact integers, so the result is engine- and partitioning-invariant.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true) // reused by degrees, orientation, and counts
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val lowFirst = // orientation rank: (degree, id) lexicographic
      col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val o = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(lowFirst, col("a")).otherwise(col("b")).as("s"),
        when(lowFirst, col("b")).otherwise(col("a")).as("t"),
        when(lowFirst, col("db")).otherwise(col("da")).as("tdeg"))
      .localCheckpoint(true) // two wedge sides + closing side share one build
    val wedgeOrder = // consistent (rank) order over a wedge's two far ends
      col("e1.tdeg") < col("e2.tdeg") ||
        (col("e1.tdeg") === col("e2.tdeg") && col("e1.t") < col("e2.t"))
    val tris = o.as("e1")
      .join(o.as("e2"), col("e1.s") === col("e2.s") && wedgeOrder)
      .join(o.select(col("s").as("cs"), col("t").as("ct")),
        col("cs") === col("e1.t") && col("ct") === col("e2.t"))
      .agg(count(lit(1)).as("n_triangles"))
    val sizes = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    sizes.crossJoin(nEdges).crossJoin(tris)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"))
  }

  def pageRank(edges: DataFrame, iters: Int, nPartitions: Int = 0): DataFrame = {
    val parts = if (nPartitions > 0) nPartitions
      else edges.sparkSession.sparkContext.defaultParallelism
    // out-degree rides ON the persisted edge rows (one static window over
    // the same src partitioning the repartition just established), so the
    // per-iteration edges-to-degree join of the old formulation — a whole
    // extra shuffle-join per round over O(edges) rows — disappears; each
    // round joins ranks to edges exactly once.
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(parts, col("src"))
      .withColumn("_deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist()
    try {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .localCheckpoint(true)
      val n = nodes.count()
      val base = (Scale * 15L) / (100L * n) // (1-d)/n, floored once
      val pr0 = Scale / n
      // zero-contribution rows for EVERY node, unioned into each round's
      // aggregation: the groupBy then emits every node (dangling included,
      // at sum 0), which replaces the old per-round nodes-left-join —
      // integer sums are unchanged by added zeros, so ranks stay
      // bit-identical while each round drops from three joins + an
      // aggregate to one join + one aggregate.
      val zeros = nodes.select(col("id").as("dst"), lit(0L).as("_c"))
        .localCheckpoint(true)
      var pr = nodes.withColumn("pr", lit(pr0))
      for (_ <- 1 to iters) {
        val contrib = e.join(pr, e("src") === pr("id"))
          .select(col("dst"), expr("pr DIV _deg").as("_c"))
        pr = contrib.union(zeros)
          .groupBy(col("dst")).agg(sum(col("_c")).as("_s"))
          .select(col("dst").as("id"),
            (lit(base) + expr("85 * _s DIV 100")).as("pr"))
          .localCheckpoint(true) // truncate lineage: O(1) plan per round
      }
      pr
    } finally e.unpersist()
  }
}
