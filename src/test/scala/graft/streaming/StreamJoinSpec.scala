package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  final case class Click(c_user: Long, c_ts: Timestamp, c_id: Long)
  final case class Purchase(p_user: Long, p_ts: Timestamp, p_value: Double)

  test("interval join pairs events within the range, across micro-batches") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.intervalJoin(
      clicks.toDF(), purchases.toDF(),
      leftKey = "c_user", rightKey = "p_user",
      leftTime = "c_ts", rightTime = "p_ts",
      leftDelay = "10 minutes", rightDelay = "10 minutes",
      lower = "30 MINUTES", upper = "0 SECONDS")
    val q = joined.select("c_id", "p_value").writeStream
      .format("memory").queryName("ij_test").outputMode("append").start()
    try {
      clicks.addData(Click(1L, ts("2024-01-01 01:00:00"), 100L))
      purchases.addData(Purchase(1L, ts("2024-01-01 00:45:00"), 9.5)) // in range
      q.processAllAvailable()
      // next batch: one in-range purchase for user 1 (state held the click),
      // one out-of-range (too early), one wrong user
      purchases.addData(
        Purchase(1L, ts("2024-01-01 00:50:00"), 1.5),
        Purchase(1L, ts("2024-01-01 00:10:00"), 2.5),
        Purchase(2L, ts("2024-01-01 00:55:00"), 3.5))
      q.processAllAvailable()
      val got = spark.table("ij_test").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((100L, 9.5), (100L, 1.5)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.intervalJoin(
      clicks.toDF(), purchases.toDF(),
      leftKey = "c_user", rightKey = "p_user",
      leftTime = "c_ts", rightTime = "p_ts",
      leftDelay = "5 minutes", rightDelay = "5 minutes",
      lower = "10 MINUTES", upper = "0 SECONDS",
      joinType = "left_outer")
    val q = joined.select("c_id", "p_value").writeStream
      .format("memory").queryName("ij_outer_test").outputMode("append").start()
    try {
      clicks.addData(Click(1L, ts("2024-01-01 01:00:00"), 100L))
      purchases.addData(Purchase(2L, ts("2024-01-01 01:00:00"), 0.5))
      q.processAllAvailable()
      // advance BOTH watermarks far past the click's range; the unmatched
      // left row must then surface with a null right side
      clicks.addData(Click(9L, ts("2024-01-01 03:00:00"), 900L))
      purchases.addData(Purchase(9L, ts("2024-01-01 03:00:00"), 0.1))
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("ij_outer_test").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1))).toSet
      assert(got.contains((100L, null)), s"unmatched click not emitted: $got")
    } finally q.stop()
  }

  test("stream-static enrichment: dim joins per micro-batch without state") {
    implicit val ctx = spark.sqlContext
    // stream-static joins are stateless (the static side re-resolves per
    // micro-batch; no watermark needed) — the standard enrichment shape
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("d_user", "tier")
    val clicks = MemoryStream[Click]
    val joined = clicks.toDF()
      .join(broadcast(dim), col("c_user") === col("d_user"), "left")
      .select("c_id", "tier")
    val q = joined.writeStream.format("memory").queryName("ss_test")
      .outputMode("append").start()
    try {
      clicks.addData(
        Click(1L, ts("2024-01-01 01:00:00"), 100L),
        Click(3L, ts("2024-01-01 01:00:00"), 300L)) // no dim row -> null tier
      q.processAllAvailable()
      val got = spark.table("ss_test").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(100L -> Some("gold"), 300L -> None))
    } finally q.stop()
  }

  test("disjoint-column contract is enforced") {
    val a = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("user", "ts")
    val b = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("user", "pts")
    val e = intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(a, b, "user", "user", "ts", "pts",
        "1 minute", "1 minute", "1 MINUTES", "0 SECONDS")
    }
    assert(e.getMessage.contains("user"))
  }

  test("the same operator runs in batch mode (watermarks are no-ops)") {
    val clicks = Seq(
      (1L, ts("2024-01-01 01:00:00"), 100L),
      (2L, ts("2024-01-01 02:00:00"), 200L)).toDF("c_user", "c_ts", "c_id")
    val purchases = Seq(
      (1L, ts("2024-01-01 00:45:00"), 9.5),
      (2L, ts("2024-01-01 01:00:00"), 8.5)).toDF("p_user", "p_ts", "p_value")
    val out = StreamJoin.intervalJoin(clicks, purchases,
      "c_user", "p_user", "c_ts", "p_ts", "10 minutes", "10 minutes",
      "30 MINUTES", "0 SECONDS")
      .select("c_id", "p_value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((100L, 9.5))) // user 2's purchase is 1h before the click
  }
}
