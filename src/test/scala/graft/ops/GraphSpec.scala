package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank: exact fixed points, mass conservation up to floor
  * loss, ordering by link structure, and partitioning-invariance (the
  * property that puts it under the exact-match oracle gate).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle is an exact fixed point of the integer iteration") {
    // n=2: pr0 = 5e11; each node passes its whole rank on; one step gives
    // 15e12/200 + 85*5e11/100 = 75e9 + 425e9 = 5e11 again — exactly.
    val got = ranks(Seq((1L, 2L), (2L, 1L)), iters = 7)
    assert(got == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("a sink-heavy hub outranks its spokes; mass conserved up to floors") {
    // star: 1..4 -> 0, 0 -> 1 (keeps every node's out-degree positive);
    // 50 iterations damp the 0<->1 cycle's parity oscillation (factor
    // 0.7225 per round) well past the steady-state gap
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
    val got = ranks(edges, iters = 50)
    assert(got(0L) > got(1L) && got(1L) > got(2L))
    assert(got(2L) == got(3L) && got(3L) == got(4L)) // symmetric spokes tie
    val total = got.values.sum
    // each of the 5 nodes can lose < 200 units/iteration to the 3 floors
    assert(total <= Graph.Scale && total > Graph.Scale - 50L * 5 * 200)
  }

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val r = Graph.triangleStats(edges.toDF("src", "dst")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("triangle census on known graphs") {
    // one triangle, reversed/parallel edges and a self-loop collapse away
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 1L))) ==
      (3L, 3L, 3L, 1L))
    // square without diagonal: 4 wedges, no triangle; with one diagonal: 2
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(tri(sq) == (4L, 4L, 4L, 0L))
    assert(tri(sq :+ (1L, 3L)) == (4L, 5L, 8L, 2L))
    // K4: every one of the C(4,3) vertex trios closes
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(k4)._4 == 4L)
    // star: all wedges, nothing closes (hub fan-out must not blow up)
    assert(tri(Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))) == (5L, 4L, 6L, 0L))
  }

  test("result is identical under different partitionings") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val a = Graph.pageRank(edges.toDF("src", "dst").repartition(1), 5, nPartitions = 1)
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(13), 5, nPartitions = 7)
    assert(a.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
