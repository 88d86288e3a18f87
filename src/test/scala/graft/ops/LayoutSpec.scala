package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness on known bit patterns, and the
  * pruning property the layout exists for — a two-dimensional predicate
  * overlaps few of the zone map's file boxes.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits places a's bits at even and b's at odd positions") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (3L, 3L))
      .toDF("a", "b")
      .select(Layout.interleaveBits(col("a"), col("b"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    //            a=1 -> 0b01; b=1 -> 0b10; a=3 -> 0b0101; b=3 -> 0b1010
    assert(got == Seq(0L, 1L, 2L, 5L, 10L, 15L))
  }

  test("skipEval accounting: partitions files exactly, never under-reads") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 5000).map { i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextDouble() * 500.0)
    }
    val r = Layout.skipEval(rows.toDF("event_id", "user_id", "value"),
      "user_id", "value", bits = 8, nFiles = 64,
      loL = 100L, hiL = 200L, loD = 50.0, hiD = 150.0).head()
    val (nFiles, nRead, nSkipped, rowsRead, rowsMatching) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nRead + nSkipped == nFiles)
    // a zone map may over-read (loose boxes) but must NEVER under-read:
    // every true match lives in a file the reader keeps
    assert(rowsRead >= rowsMatching && rowsMatching > 0)
    assert(nSkipped > 0) // and the layout must actually prune something
  }

  test("zone-map boxes are tight: a point-ish predicate overlaps few files") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 20000).map { i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextDouble() * 500.0)
    }
    val zm = Layout.zoneMap(rows.toDF("event_id", "user_id", "value"),
      "user_id", "value", bits = 8, nFiles = 64).collect()
    assert(zm.map(_.getLong(1)).sum == 20000L) // every row landed in a file
    // predicate box: user_id in [100, 150] AND value in [50, 100] — on a
    // random-uniform table a SINGLE-column sort leaves the other dimension
    // full-range in every file; the Z-layout must prune most files on the
    // combined predicate
    val overlapping = zm.count { r =>
      val (mnU, mxU, mnV, mxV) = (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
      mxU >= 100L && mnU <= 150L && mxV >= 50.0 && mnV <= 100.0
    }
    assert(zm.length > 32, s"fixture degenerated to ${zm.length} files")
    assert(overlapping <= zm.length / 4,
      s"$overlapping of ${zm.length} files overlap — boxes are not tight")
  }
}
