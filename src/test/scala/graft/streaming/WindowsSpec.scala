package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling windows aggregate with a watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val agg = Windows.tumblingAgg(
      ms.toDF().toDF("t", "etype", "v"),
      eventTime = col("t"), windowLength = "1 minute",
      watermarkDelay = Some("30 seconds"),
      groupCols = Seq(col("etype")),
      aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
    val q = agg.writeStream.format("memory").queryName("win_test")
      .outputMode("update").start()
    try {
      ms.addData(
        (Timestamp.valueOf("2024-01-01 00:00:10"), "a", 1.0),
        (Timestamp.valueOf("2024-01-01 00:00:50"), "a", 2.0),
        (Timestamp.valueOf("2024-01-01 00:01:10"), "b", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_test")
        .select("window_start", "etype", "n", "sv")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "a", 2L, 3.0),
        ("2024-01-01 00:01:00.0", "b", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming session windows merge within the gap, close past it") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val agg = Windows.sessionAgg(
      ms.toDF().toDF("t", "uid"),
      eventTime = col("t"), gap = "10 minutes",
      watermarkDelay = Some("1 minute"),
      groupCols = Seq(col("uid")),
      aggs = Seq(count(lit(1)).as("n")))
    // session windows only support append output in streaming: a session is
    // emitted once the watermark passes its close
    val q = agg.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      ms.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 00:05:00"), 1L),  // merges (< gap)
        (Timestamp.valueOf("2024-01-01 01:00:00"), 1L))  // new session
      q.processAllAvailable()
      // advance the watermark far past every session close so all emit
      ms.addData((Timestamp.valueOf("2024-01-01 09:00:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("sess_test")
        .select("uid", "session_start", "session_end", "n")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(rows.contains((1L, "2024-01-01 00:00:00.0", "2024-01-01 00:15:00.0", 2L)))
      assert(rows.contains((1L, "2024-01-01 01:00:00.0", "2024-01-01 01:10:00.0", 1L)))
    } finally q.stop()
  }

  test("session windows: an event exactly gap after the last still MERGES") {
    // pins the boundary rule the DuckDB oracle must mirror: sessions merge
    // while diff <= gap; a break needs diff STRICTLY greater than the gap
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (Timestamp.valueOf("2024-01-01 00:10:00"), 1L)).toDF("t", "uid")
    val out = Windows.sessionAgg(df, col("t"), "10 minutes", None,
      Seq(col("uid")), Seq(count(lit(1)).as("n")))
    assert(out.count() == 1)
    val df2 = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (Timestamp.valueOf("2024-01-01 00:10:00.001"), 1L)).toDF("t", "uid")
    val out2 = Windows.sessionAgg(df2, col("t"), "10 minutes", None,
      Seq(col("uid")), Seq(count(lit(1)).as("n")))
    assert(out2.count() == 2)
  }

  test("batch mode: same operator works without watermark") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:10"), "a", 1.0),
      (Timestamp.valueOf("2024-01-01 00:02:30"), "a", 2.0)).toDF("t", "etype", "v")
    val out = Windows.tumblingAgg(df, col("t"), "1 minute", None,
      Seq(col("etype")), Seq(count(lit(1)).as("n")))
    assert(out.count() == 2)
  }
}
