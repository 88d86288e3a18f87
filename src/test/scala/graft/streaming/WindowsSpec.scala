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

  test("batch mode: same operator works without watermark") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:10"), "a", 1.0),
      (Timestamp.valueOf("2024-01-01 00:02:30"), "a", 2.0)).toDF("t", "etype", "v")
    val out = Windows.tumblingAgg(df, col("t"), "1 minute", None,
      Seq(col("etype")), Seq(count(lit(1)).as("n")))
    assert(out.count() == 2)
  }
}
