package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the escape hatch
  * for per-key semantics no built-in operator expresses (SURVEY §2.10 has
  * none in the reference; this is the Structured-Streaming-native tool the
  * brief's streaming contract calls for).
  *
  * `dropStale` performs cross-batch stale-event suppression: per key, only
  * events whose timestamp is >= the maximum already emitted pass (the same
  * inclusive rule as the merge ts-guard T7, so a same-ts update still wins).
  * The bar is monotone ACROSS batches: within one micro-batch, any event
  * clearing the entering bar is emitted, so fresh events may still arrive
  * out of order intra-batch (behavior pinned by spec) — downstream sinks
  * keep their own ts-guard as the per-row backstop.
  *
  * Scale: state is one Long per live key, partitioned by the group key in
  * the state store (spillable, checkpointed); event-time timeout evicts
  * keys idle past the watermark delay, bounding state size by the active
  * key set, not the historical one. A late event arriving after its key's
  * eviction passes through — and the sink ts-guard remains the backstop.
  */
object StatefulOps {

  /** One keyed changelog event; `ts` is the event time (watermark column). */
  final case class KeyedEvent(key: Long, ts: java.sql.Timestamp, payload: String)

  /** One (group, item) observation for streaming frequency profiling. */
  final case class GroupedItem(key: String, item: String)

  /** A group's current frequent-items summary after a micro-batch. */
  final case class HHSummary(key: String, items: Seq[(String, Long)], n: Long)

  /** Continuous heavy hitters per group: a Misra-Gries summary held in the
    * keyed state store and folded forward every micro-batch — the
    * streaming face of the `misra_gries` aggregate, sharing its update
    * rule verbatim ([[graft.functions.MisraGries.updateOne]]), so batch
    * and stream cannot disagree on what the summary is.
    *
    * State per group is O(k) — (k-1) counters plus the running n —
    * REGARDLESS of stream length or item universe: the profile of an
    * unbounded stream costs the same state on day 1000 as on day 1. The
    * usual alternative (grouped count + rank per trigger) holds one
    * counter per distinct item ever seen, which an unbounded-universe
    * stream (URLs, query strings) grows without limit. Emitted in Update
    * mode: each batch outputs the refreshed summary for groups that saw
    * data, sorted (count desc, item) like the batch aggregate's eval. The
    * MG guarantees hold against the TOTAL stream per group: estimates
    * undercount by at most n/k, every item above n/k frequency is present.
    */
  def heavyHittersStream(items: Dataset[GroupedItem], k: Int): Dataset[HHSummary] = {
    import items.sparkSession.implicits._
    require(k >= 2, "k must be >= 2")
    items.groupByKey(_.key)
      .mapGroupsWithState[(Map[String, Long], Long), HHSummary](
        GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[GroupedItem],
         state: GroupState[(Map[String, Long], Long)]) =>
          val (saved, n0) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          val buf = scala.collection.mutable.HashMap.from(saved)
          var n = n0
          it.foreach { gi =>
            graft.functions.MisraGries.updateOne(buf, gi.item, k - 1)
            n += 1
          }
          state.update((buf.toMap, n))
          HHSummary(key,
            buf.toSeq.sortBy { case (s, c) => (-c, s) }, n)
      }
  }

  /** At-least-once -> effectively-once: drop redelivered events whose
    * identity columns repeat within the watermark window, via the built-in
    * state-store dedup (`dropDuplicatesWithinWatermark`). State holds one
    * entry per distinct identity seen within the delay and is evicted as
    * the watermark passes — bounded by arrival rate x delay, not by stream
    * history. Real delivery-retry windows (source redelivery, file
    * re-listing) are minutes, well inside any sane delay; duplicates
    * arriving later than the delay are the merge ts-guard's job (T7),
    * which stays the per-row backstop downstream.
    */
  def dedupRedelivered(df: DataFrame, eventTimeCol: String, watermarkDelay: String,
                       idCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  def dropStale(events: Dataset[KeyedEvent], watermarkDelay: String): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyedEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[KeyedEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: evict; sink ts-guard backstops late data
            Iterator.empty
          } else {
            // emitted set = events with ts >= the ENTERING max (processing
            // in ts order can only raise the bar with values later events
            // already clear), so one unsorted pass suffices — no O(n log n)
            // sort, and only emitted events buffer (state must be updated
            // before the iterator is returned, so full laziness is off the
            // table anyway)
            val enteringMax = state.getOption.getOrElse(Long.MinValue)
            var last = enteringMax
            val out = scala.collection.mutable.ArrayBuffer.empty[KeyedEvent]
            it.foreach { e =>
              val t = e.ts.getTime
              if (t >= enteringMax) {
                out += e
                if (t > last) last = t
              }
            }
            state.update(last)
            // evict once the watermark passes last-event + delay; in batch
            // execution there is no watermark and the call throws
            // UnsupportedOperationException — state dies with the job there,
            // so eviction is moot. Only that error is swallowed: a real
            // streaming-side timeout failure must surface.
            try state.setTimeoutTimestamp(last, watermarkDelay)
            catch { case _: UnsupportedOperationException => () }
            out.iterator
          }
      }
  }
}
