package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error-bound pins for the sketch operators behind the `sketch_profile`
  * query (rows-only under the driver gate — sketch estimates are
  * engine-specific, so correctness lives here, against exact answers).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = {
    // deterministic synthetic stream: 20k events, ~1.3k distinct users per
    // type, value exponential-ish in the row index
    (0L until 20000L).map { i =>
      val etype = Seq("click", "view", "purchase")(((i % 10) % 3).toInt)
      (i, i % 4000 / 3, etype, (i % 997).toDouble / 10.0)
    }.toDF("event_id", "user_id", "event_type", "value")
  }

  test("approx_count_distinct stays within the configured rsd of exact") {
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      // 0.02 rsd -> allow 3 sigma = 6%
      assert(math.abs(ap - ex) / ex < 0.06, s"$k: approx $ap vs exact $ex")
    }
  }

  test("percentile_approx lands within rank tolerance of the exact quantile") {
    val vals = events.filter(col("event_type") === "click")
      .select("value").as[Double].collect().sorted
    val Seq(p50, p95) = events.filter(col("event_type") === "click")
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.95)), lit(10000)))
      .collect()(0).getSeq[Double](0).toSeq
    def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / vals.length
    // accuracy 10000 -> rank error <= 1/10000; allow 1% slack for ties
    assert(math.abs(rankOf(p50) - 0.5) < 0.01, s"p50=$p50 rank=${rankOf(p50)}")
    assert(math.abs(rankOf(p95) - 0.95) < 0.01, s"p95=$p95 rank=${rankOf(p95)}")
  }

  test("HLL union-of-parts stays within the error bound of exact") {
    // the mergeability contract behind sketch_incremental: building
    // partial sketches and unioning them must estimate the whole stream's
    // cardinality within the configured error. NOTE exact equality with a
    // directly-built sketch is NOT guaranteed: DataSketches keeps the
    // insertion-order-dependent HIP estimator on a direct sketch but merge
    // paths can fall back to the composite estimator, so past sparse/set
    // mode the two paths may differ by a few counts (observed at sf0.1).
    // What IS guaranteed — and pinned here — is the post-merge bound.
    val whole = events.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect()(0).getLong(0)
    val merged = events
      .groupBy(pmod(col("event_id"), lit(7L)).as("part"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .collect()(0).getLong(0)
    val exact = events.select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(math.abs(merged.toDouble - exact) / exact < 0.03,
      s"merged HLL estimate $merged vs exact $exact")
    assert(math.abs(whole.toDouble - exact) / exact < 0.03,
      s"direct HLL estimate $whole vs exact $exact")
  }

  test("count-min sketch never undercounts and stays within eps*n of exact") {
    val cms = events.stat.countMinSketch(col("user_id"), eps = 0.001,
      confidence = 0.99, seed = 42)
    val exact = events.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = events.count()
    exact.take(200).foreach { case (uid, ex) =>
      val est = cms.estimateCount(java.lang.Long.valueOf(uid))
      assert(est >= ex, s"CMS undercounted $uid: $est < $ex")
      assert(est <= ex + (0.001 * n).toLong + 1, s"CMS overshoot for $uid: $est vs $ex")
    }
  }
}
