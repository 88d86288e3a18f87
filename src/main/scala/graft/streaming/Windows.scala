package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time tumbling windows with watermarked late-data handling — the
  * Structured-Streaming-native replacement for the reference's hand-rolled
  * `future_data` carryover (W1-W3, ref:
  * archive/streaming_from_kafka_to_minio_2.py:177-214).
  *
  * The reference holds back events whose window hasn't closed in a
  * driver-side DataFrame and unions them into the next batch; a watermark
  * expresses exactly that contract declaratively, with state kept in the
  * streaming aggregation operator (partitioned, spillable — no driver
  * state, which is what makes it hold at scale).
  */
object Windows {

  /** Tumbling windowed aggregation over a streaming (or batch) frame.
    * `aggs` apply per (window, extra grouping cols).
    */
  def tumblingAgg(df: DataFrame, eventTime: Column, windowLength: String,
                  watermarkDelay: Option[String], groupCols: Seq[Column],
                  aggs: Seq[Column]): DataFrame = {
    val withTime = df.withColumn("_event_time", eventTime)
    val marked = watermarkDelay match {
      case Some(d) => withTime.withWatermark("_event_time", d)
      case None    => withTime
    }
    marked
      .groupBy(window(col("_event_time"), windowLength) +: groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }
}
