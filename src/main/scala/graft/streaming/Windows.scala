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

  /** Gap-based session windows via the built-in `session_window`: events of
    * one group closer than `gap` merge into one session; the window closes
    * (and, in streaming, its state evicts) once the watermark passes
    * last-event-time + gap. The streaming-native form of sessionization —
    * same semantics as the batch lag+running-sum formulation, but with
    * incremental merge-on-arrival state instead of a full re-sort.
    */
  def sessionAgg(df: DataFrame, eventTime: Column, gap: String,
                 watermarkDelay: Option[String], groupCols: Seq[Column],
                 aggs: Seq[Column]): DataFrame = {
    val withTime = df.withColumn("_event_time", eventTime)
    val marked = watermarkDelay match {
      case Some(d) => withTime.withWatermark("_event_time", d)
      case None    => withTime
    }
    marked
      .groupBy(session_window(col("_event_time"), gap) +: groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }
}
