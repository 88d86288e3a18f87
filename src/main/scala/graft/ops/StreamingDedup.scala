package graft.ops

import graft.cdc.{Changelog, ManifestStore}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming corpus deduplication with a PERSISTENT fingerprint index —
  * the long-lived form of [[Dedup.incrementalNearDups]]'s batch-vs-history
  * pass (whose scaladoc promised exactly this: "in a long-lived pipeline
  * the history band index would persist in a store instead of being
  * recomputed per batch").
  *
  * The index is a [[graft.cdc.ManifestStore]] keyed by the document
  * fingerprint (md5 text hash — a STRING key, which the store's typed
  * per-file stats serve natively), mapping fp -> the first doc_id that
  * claimed it. Each arriving batch:
  *
  *   1. resolves in-batch duplicates (lowest doc_id wins — one window over
  *      the BATCH, never the corpus),
  *   2. joins the batch's fingerprints against the stats-pruned index read
  *      ([[graft.cdc.ManifestStore.readHit]]) to flag cross-batch dups,
  *   3. inserts the surviving new fingerprints via
  *      [[graft.cdc.ManifestStore.mergeOnRead]] — uniform hash keys
  *      scatter across every file's range, the copy-on-write worst case,
  *      so the deletion-vector path's O(batch) write amplification is not
  *      an optimization here but the difference between an index that can
  *      absorb batches forever and one that rewrites itself per trigger.
  *
  * Exactly-once: the store's (batchId, streamId) replay guard makes
  * re-processing a batch a no-op on the index. First-wins is FIRST-ARRIVAL
  * wins: the index keeps the first claimant of each fingerprint, so the
  * incremental result equals the global doc_id-min window only when
  * batches arrive in doc_id order (the ingestion-pipeline case, and what
  * [[verdictsFromIndex]] and the `dedup_streaming_index` oracle assume) —
  * with out-of-order batches the index is still a valid dedup (exactly one
  * keeper per fingerprint), just keyed to arrival order, and `mergeOnRead`
  * never replaces an existing claim with a later-arriving lower doc_id.
  */
object StreamingDedup {
  val FpCol = "fp"
  val FirstDocCol = "first_doc"
  /** When the claim was FIRST made (caller clock; defaults to the batch
    * id). Deliberately not last-seen: updating it on every sighting would
    * turn each index read into an index write. Retention is therefore
    * "expire claims older than N since first claim" — the Bloom-rotation
    * convention.
    */
  val ClaimTsCol = "claim_ts"

  /** Index schema fields, in manifest order. */
  private val fields = Seq(FpCol, FirstDocCol, ClaimTsCol)

  /** Seed an empty index (one empty v0 file set, batchId -1 leaves every
    * real batch id unconsumed for replay detection).
    */
  def init(index: ManifestStore, spark: org.apache.spark.sql.SparkSession): Unit =
    if (!index.exists) {
      import org.apache.spark.sql.types._
      index.commit(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField(FpCol, StringType),
          StructField(FirstDocCol, LongType),
          StructField(ClaimTsCol, LongType)))),
        batchId = -1L, nFiles = 1)
    }

  /** Retention/TTL for either index (fingerprint or band — both carry
    * [[ClaimTsCol]]): drop every claim older than `olderThan`, at
    * O(matches) write cost ([[graft.cdc.ManifestStore.deleteWhere]] masks
    * keys in deletion-vector sidecars; optimize folds them back on its
    * normal schedule). An expired fingerprint RE-ADMITS: the next document
    * carrying it becomes the new first claimant. Inside the retained
    * window the first-wins theorem is untouched — expiry only ever
    * removes whole claims, never reassigns one. Shares the index's
    * (batchId, streamId) exactly-once sequence: pass a batch id above
    * every ingested batch's, and keep later ingests above this one.
    */
  def expire(index: ManifestStore, olderThan: Long,
             batchId: Long): Option[ManifestStore.MorStats] =
    index.deleteWhere(col(ClaimTsCol) < olderThan, batchId)

  /** [[expire]] as a MAINTENANCE commit (same batchId/streamId as the
    * index's current version, like OPTIMIZE): for expiry interleaved with
    * a stream's own exactly-once batch sequence, where a guarded delete
    * would consume — or be swallowed by — the stream's next batch id.
    */
  def expireMaintenance(index: ManifestStore,
                        olderThan: Long): Option[ManifestStore.MorStats] =
    index.deleteWhereMaintenance(col(ClaimTsCol) < olderThan)

  /** Process one arriving batch of `(docIdCol, fingerprint)` rows: returns
    * per-document verdicts `(doc_id, is_dup, dup_of)` — dup_of is the
    * winning document (in-batch or from the index), null for keepers — and
    * commits the new fingerprints. The returned frame is materialized
    * against the PRE-merge index (its plan pins the manifest's file list),
    * so laziness cannot leak post-merge state into the verdicts.
    */
  def processBatch(index: ManifestStore, batch: DataFrame, docIdCol: String,
                   fpCol: Column, batchId: Long,
                   claimTs: Long = -1L): DataFrame = {
    val ts = if (claimTs >= 0L) claimTs else batchId
    val b = batch.select(col(docIdCol).as("doc_id"), fpCol.as(FpCol))
    val w = Window.partitionBy(FpCol).orderBy("doc_id")
    val marked = b
      .withColumn("_rn", row_number().over(w))
      .withColumn("_first_in_batch", first(col("doc_id")).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // stats-pruned index read for this batch's fingerprints; then the
      // Merge.applyChangesFull discipline: the index STREAMS past the
      // broadcast batch keys (semi-reduction to a batch-sized hit set),
      // and only that hit set joins back — the index never shuffles and
      // is never broadcast
      val idx = index.readHit(marked.select(col(FpCol).as(Changelog.KeyCol)))
        .get.select(col(FpCol), col(FirstDocCol))
      val hits = idx.join(broadcast(marked.select(FpCol).distinct()),
        Seq(FpCol), "left_semi")
      val joined = marked.join(broadcast(hits), Seq(FpCol), "left")
      val verdicts = joined.select(
        col("doc_id"),
        (col(FirstDocCol).isNotNull || col("_rn") > 1).cast("int").as("is_dup"),
        coalesce(col(FirstDocCol),
          when(col("_rn") > 1, col("_first_in_batch"))).as("dup_of"))
      // eager localCheckpoint: materializes the PRE-merge verdicts (a
      // foreachBatch source may not be re-evaluable after the trigger)
      // and truncates lineage WITHOUT a cache entry the caller would have
      // to remember to unpersist — a stream processes one batch per
      // trigger forever, so a persist here would leak one entry per batch
      val out = verdicts.localCheckpoint(true)
      // new fingerprints: in-batch winners the index has never seen
      val net = joined.filter(col("_rn") === 1 && col(FirstDocCol).isNull)
        .select(col(FpCol).as(Changelog.KeyCol),
          lit("c").as(Changelog.OpCol), lit(batchId).as(Changelog.TsCol),
          col(FpCol).as(s"after_$FpCol"),
          col("doc_id").as(s"after_$FirstDocCol"),
          lit(ts).as(s"after_$ClaimTsCol"))
      index.mergeOnRead(net, fields, batchId)
      out
    } finally marked.unpersist()
  }

  /** Replay-safe full-corpus verdicts from the FINAL index: a document is
    * a dup iff it is not its fingerprint's first claimant. Equals the
    * union of per-batch verdicts whenever batches arrive in doc_id order —
    * the oracle's first-wins window.
    */
  def verdictsFromIndex(index: ManifestStore, docs: DataFrame,
                        docIdCol: String, fpCol: Column): DataFrame =
    docs.select(col(docIdCol).as("doc_id"), fpCol.as(FpCol))
      .join(index.read().get.select(col(FpCol), col(FirstDocCol)), Seq(FpCol))
      .select(col("doc_id"),
        (col("doc_id") =!= col(FirstDocCol)).cast("int").as("is_dup"),
        when(col("doc_id") =!= col(FirstDocCol), col(FirstDocCol))
          .as("dup_of"))

  // ── Fuzzy half: a persistent MinHash BAND index ──────────────────────
  //
  // Same pipeline shape as the exact index, with LSH band keys instead of
  // fingerprints: a document is a CANDIDATE near-dup iff any of its bands
  // was first claimed by a lower doc_id — "LSH candidate of an earlier
  // document", the arriving-data decision [[Dedup.incrementalNearDups]]
  // makes, with the history band set PERSISTED instead of recomputed per
  // batch. The band->first-claimant map is order-independent for ordered
  // batch ranges, so incremental == the global band-min window (the
  // `dedup_streaming_bands` oracle). No pairwise join exists anywhere —
  // hot bands cost extra verdict rows, never a quadratic blowup, so no
  // df-cap is needed for correctness or scale.

  val BandCol = "bk"
  private val bandFields = Seq(BandCol, FirstDocCol, ClaimTsCol)

  /** Seed an empty band index (key = "band:key" string). */
  def initBands(index: ManifestStore,
                spark: org.apache.spark.sql.SparkSession): Unit =
    if (!index.exists) {
      import org.apache.spark.sql.types._
      index.commit(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField(BandCol, StringType),
          StructField(FirstDocCol, LongType),
          StructField(ClaimTsCol, LongType)))),
        batchId = -1L, nFiles = 1)
    }

  /** Process one arriving batch of documents `(doc_id, text)`: returns
    * `(doc_id, n_hit_bands, is_candidate_dup)` — bands hit = bands whose
    * known first claimant (index, or a lower doc_id in this batch)
    * precedes the document; shingle-less docs carry zeros — and claims the
    * batch's new band keys in the index.
    */
  def processBandBatch(index: ManifestStore, batch: DataFrame,
                       batchId: Long, claimTs: Long = -1L): DataFrame = {
    val ts = if (claimTs >= 0L) claimTs else batchId
    val bands = Dedup.minHashBands(batch)
      .select(col("doc_id"),
        concat(col("band"), lit(":"), col("key")).as(BandCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = Window.partitionBy(BandCol)
      val marked = bands.withColumn("_min_in_batch", min("doc_id").over(w))
      val idx = index.readHit(bands.select(col(BandCol).as(Changelog.KeyCol)))
        .get.select(col(BandCol), col(FirstDocCol))
      val hits = idx.join(broadcast(bands.select(BandCol).distinct()),
        Seq(BandCol), "left_semi")
      val joined = marked.join(broadcast(hits), Seq(BandCol), "left")
        .withColumn("_claimant",
          least(coalesce(col(FirstDocCol), col("_min_in_batch")),
            col("_min_in_batch")))
      val verdict = joined.groupBy("doc_id").agg(
        sum(when(col("_claimant") < col("doc_id"), 1L).otherwise(0L))
          .as("n_hit_bands"),
        max(when(col("_claimant") < col("doc_id"), 1).otherwise(0))
          .as("is_candidate_dup"))
      // eager localCheckpoint, not persist: same rationale as
      // [[processBatch]] — pin pre-merge verdicts with no per-trigger
      // cache-entry leak
      val out = batch.select("doc_id").join(verdict, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"),
          coalesce(col("is_candidate_dup"), lit(0)).as("is_candidate_dup"))
        .localCheckpoint(true)
      val net = joined
        .filter(col(FirstDocCol).isNull &&
          col("doc_id") === col("_min_in_batch"))
        .select(col(BandCol).as(Changelog.KeyCol),
          lit("c").as(Changelog.OpCol), lit(batchId).as(Changelog.TsCol),
          col(BandCol).as(s"after_$BandCol"),
          col("doc_id").as(s"after_$FirstDocCol"),
          lit(ts).as(s"after_$ClaimTsCol"))
        .distinct()
      index.mergeOnRead(net, bandFields, batchId)
      out
    } finally bands.unpersist()
  }

  /** Full-corpus verdicts from the FINAL band index (replay-safe: pure
    * read). Equals the per-batch union for doc_id-range-ordered batches.
    */
  def verdictsFromBandIndex(index: ManifestStore, docs: DataFrame): DataFrame = {
    val bands = Dedup.minHashBands(docs)
      .select(col("doc_id"),
        concat(col("band"), lit(":"), col("key")).as(BandCol))
    val idx = index.read().get.select(col(BandCol), col(FirstDocCol))
    val verdict = bands.join(idx, Seq(BandCol))
      .groupBy("doc_id").agg(
        sum(when(col(FirstDocCol) < col("doc_id"), 1L).otherwise(0L))
          .as("n_hit_bands"),
        max(when(col(FirstDocCol) < col("doc_id"), 1).otherwise(0))
          .as("is_candidate_dup"))
    docs.select("doc_id").join(verdict, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"),
        coalesce(col("is_candidate_dup"), lit(0)).as("is_candidate_dup"))
  }
}
