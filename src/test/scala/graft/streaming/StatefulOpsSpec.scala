package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._
  import StatefulOps.KeyedEvent

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropStale suppresses cross-batch regressions, keeps same-ts updates") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val out = StatefulOps.dropStale(ms.toDS(), watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("stale_test")
      .outputMode("append").start()
    try {
      ms.addData(
        KeyedEvent(1L, ts("2024-01-01 00:10:00"), "v1"),
        KeyedEvent(2L, ts("2024-01-01 00:05:00"), "w1"))
      q.processAllAvailable()
      ms.addData(
        KeyedEvent(1L, ts("2024-01-01 00:01:00"), "stale"),   // < state: dropped
        KeyedEvent(1L, ts("2024-01-01 00:10:00"), "v1b"),     // == state: kept
        KeyedEvent(1L, ts("2024-01-01 00:20:00"), "v2"),      // > state: kept
        KeyedEvent(2L, ts("2024-01-01 00:04:00"), "stale2"))  // < state: dropped
      q.processAllAvailable()
      val got = spark.table("stale_test").as[KeyedEvent].collect()
        .map(e => (e.key, e.payload)).toSet
      assert(got == Set((1L, "v1"), (2L, "w1"), (1L, "v1b"), (1L, "v2")))
    } finally q.stop()
  }

  test("dropStale orders within a batch: out-of-order arrivals don't drop the max") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val out = StatefulOps.dropStale(ms.toDS(), watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("stale_order_test")
      .outputMode("append").start()
    try {
      // arrival order 20, 10: the 10 is stale relative to the batch max only
      // AFTER in-batch sorting; both pass because 10 sorts first
      ms.addData(
        KeyedEvent(1L, ts("2024-01-01 00:20:00"), "later"),
        KeyedEvent(1L, ts("2024-01-01 00:10:00"), "earlier"))
      q.processAllAvailable()
      val got = spark.table("stale_order_test").as[KeyedEvent].collect()
        .map(_.payload).toSet
      assert(got == Set("earlier", "later"))
      // a following batch below the max is suppressed
      ms.addData(KeyedEvent(1L, ts("2024-01-01 00:15:00"), "regress"))
      q.processAllAvailable()
      assert(!spark.table("stale_order_test").as[KeyedEvent].collect()
        .map(_.payload).contains("regress"))
    } finally q.stop()
  }

  test("dedupRedelivered suppresses cross-batch redelivery within the watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val out = StatefulOps.dedupRedelivered(
      ms.toDS().toDF(), "ts", "1 hour", Seq("key", "ts"))
    val q = out.writeStream.format("memory").queryName("redeliver_test")
      .outputMode("append").start()
    try {
      ms.addData(
        KeyedEvent(1L, ts("2024-01-01 00:10:00"), "a"),
        KeyedEvent(1L, ts("2024-01-01 00:10:00"), "a-dup-same-batch"),
        KeyedEvent(2L, ts("2024-01-01 00:05:00"), "b"))
      q.processAllAvailable()
      ms.addData(
        KeyedEvent(1L, ts("2024-01-01 00:10:00"), "a-retry"), // redelivery: dropped
        KeyedEvent(1L, ts("2024-01-01 00:20:00"), "c"))       // new identity: kept
      q.processAllAvailable()
      val got = spark.table("redeliver_test").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (1L, "c")))
    } finally q.stop()
  }

  test("heavyHittersStream: O(k) state carries MG guarantees across batches") {
    import StatefulOps.{GroupedItem, HHSummary}
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[GroupedItem]
    val k = 8
    val out = StatefulOps.heavyHittersStream(ms.toDS(), k)
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    val rnd = new scala.util.Random(17)
    val exact = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    def batch(nRows: Int): Seq[GroupedItem] = (0 until nRows).map { _ =>
      val item = if (rnd.nextInt(3) > 0) s"hot_${rnd.nextInt(2)}"
                 else s"cold_${rnd.nextInt(500)}"
      exact(item) += 1
      GroupedItem("g", item)
    }
    try {
      ms.addData(batch(3000): _*); q.processAllAvailable()
      ms.addData(batch(3000): _*); q.processAllAvailable()
      // latest summary for the group (update mode appends one row per batch)
      val last = spark.table("hh_stream").as[HHSummary]
        .collect().filter(_.key == "g").maxBy(_.n)
      assert(last.n == exact.values.sum)
      val got = last.items.toMap
      assert(got.size <= k - 1)
      got.foreach { case (item, est) =>
        assert(est <= exact(item), s"$item overcounted")
        assert((exact(item) - est) * k <= last.n, s"$item undercounted past n/k")
      }
      exact.collect { case (item, c) if c * k > last.n => item }
        .foreach(item => assert(got.contains(item), s"missing heavy hitter $item"))
    } finally q.stop()
  }
}
