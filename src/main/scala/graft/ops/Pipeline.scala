package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines: deterministic
  * train/val/test splits and token-budget sequence packing. Both are pure
  * per-row / per-shard-window transforms — no global coordination, no
  * driver state — so they hold their shape at 100 TB.
  */
object Pipeline {

  /** Deterministic hash split on an id column: first hex char of md5(id)
    * routes 'c','d' -> val (2/16), 'e','f' -> test (2/16), rest -> train
    * (12/16 = 75%). Stable across runs, engines, and partitionings — the
    * property a split must have so later pipeline stages can recompute
    * membership instead of persisting it.
    */
  def hashSplit(df: DataFrame, idCol: String): DataFrame = {
    val h = substring(md5(col(idCol).cast("string")), 1, 1)
    df.withColumn("split",
      when(h.isin("c", "d"), "val")
        .when(h.isin("e", "f"), "test")
        .otherwise("train"))
  }

  /** Leakage-safe split: assign train/val/test by DEDUP CLUSTER, not by
    * document, so near-duplicates can never straddle the train/test
    * boundary (the eval-contamination hole a per-doc split leaves open —
    * same motivation as benchmark decontamination, applied to the corpus'
    * own held-out split). `clusters` is a (doc_id, cluster_id) frame from
    * [[Dedup.dedupClusters]]; docs without a near-dup pair are singleton
    * clusters of themselves. The split key is the cluster representative,
    * routed through the same [[hashSplit]] hash.
    *
    * Scale shape: one left join keyed by doc_id — the clusters side holds
    * only docs that HAVE near-dups (a small fraction of any curated
    * corpus), so AQE broadcasts it when small and shuffles both sides
    * otherwise; the split itself stays a per-row expression.
    */
  def leakageSafeSplit(df: DataFrame, clusters: DataFrame): DataFrame = {
    val rep = df.join(clusters, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .drop("cluster_id")
    hashSplit(rep, "rep")
  }

  /** Token-budget sequence packing: shard = id mod `nShards`; within a
    * shard, docs pack in id order into bins of `budget` tokens (bin id =
    * tokens-before-this-doc DIV budget — contiguous greedy packing). The
    * per-shard running sum is one window over a `nShards`-way hash
    * partition; shard count scales the parallelism independently of data
    * size, exactly how distributed LLM-data packing is sharded in practice.
    */
  def packSequences(docs: DataFrame, nShards: Int, budget: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))).cast("long"))
      .withColumn("bin_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget)).cast("long"))
      .select("doc_id", "shard", "n_tokens", "bin_id")
  }

  /** Shard count sized to the data: ceil(rows / targetDocsPerShard),
    * clamped to [1, 2^20]. One count scan up front buys a per-shard window
    * whose state stays O(targetDocsPerShard) however large the corpus —
    * the packing's parallelism grows WITH the data instead of being a
    * constant a 100x scale-up would overload.
    *
    * Skew bound: shard = doc_id mod nShards, so shard sizes are uniform to
    * within the id distribution's residue balance — exact for dense ids
    * (the synthetic corpus), and any residue imbalance shifts shard sizes
    * by the same factor, never the bin-budget invariant (each bin's
    * pre-doc token sum stays < budget regardless of shard population).
    */
  def adaptiveShards(docs: DataFrame, targetDocsPerShard: Long = 100000L): Int = {
    require(targetDocsPerShard > 0, "targetDocsPerShard must be positive")
    val n = docs.count()
    math.max(1L, math.min(1L << 20, (n + targetDocsPerShard - 1) / targetDocsPerShard)).toInt
  }

  /** [[packSequences]] with the shard count derived from the input size. */
  def packSequencesAuto(docs: DataFrame, budget: Int,
                        targetDocsPerShard: Long = 100000L): DataFrame =
    packSequences(docs, adaptiveShards(docs, targetDocsPerShard), budget)

  /** Fixed-size overlapping character chunks (context-window chunking):
    * chunk i covers characters [i*step, i*step + size) with
    * step = size - overlap; every doc yields at least one chunk, and the
    * last chunk may run short. Membership and text are recomputable from
    * (doc_id, chunk_id) alone — the property that lets a downstream stage
    * re-derive chunks instead of persisting them.
    *
    * Scale shape: chunk count is a per-row expression and the expansion is
    * one `explode` — scan-linear in output size, zero shuffle.
    */
  def chunk(docs: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0, got ($size, $overlap)")
    val step = size - overlap
    val nChunks = greatest(lit(1L),
      ceil((length(col("text")) - lit(overlap)).cast("double") / step).cast("long"))
    docs
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk_text",
        expr(s"substring(text, CAST(chunk_id * $step + 1 AS INT), $size)"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
  }

  /** Deterministic global shuffle with a CONTIGUOUS global index — the
    * epoch-ordering primitive (shuffle the corpus once per epoch, then cut
    * it into training shards by position). Order = (md5(seed:id), id), so
    * the permutation is seeded and recomputable by any engine.
    *
    * This is the two-pass scalable formulation: a single global ROW_NUMBER
    * window would serialize the corpus through ONE partition. Instead the
    * hash's first `bucketChars` hex chars give 16^bucketChars DATA-DERIVED
    * buckets; rows rank inside their bucket (one keyed window — the only
    * corpus shuffle), bucket totals cumulate into offsets (O(#buckets) rows,
    * reusing the window's shuffle output), and the offsets broadcast-join
    * back: pos = bucket offset + local rank - 1. Everything is keyed by the
    * data, never by task/partition ids — a TaskContext-based counter breaks
    * under a downstream `coalesce`, which re-runs the closure per parent
    * partition inside one task.
    */
  def globalShuffle(df: DataFrame, idCol: String, seed: String,
                    bucketChars: Int = 3): DataFrame = {
    // cap at 5 (16^5 = ~1M buckets): beyond that the offsets frame stops
    // being the O(config) aggregate the single-partition cumulative window
    // and the broadcast both depend on
    require(bucketChars >= 1 && bucketChars <= 5, s"bucketChars in [1,5], got $bucketChars")
    val reserved = Seq("_h", "_b", "_r", "_off", "pos")
    require(!reserved.exists(df.columns.contains),
      s"globalShuffle reserves the column names ${reserved.mkString(", ")}")
    val keyed = df
      .withColumn("_h", md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
      .withColumn("_b", substring(col("_h"), 1, bucketChars))
    val wRank = Window.partitionBy(col("_b")).orderBy(col("_h"), col(idCol))
    val ranked = keyed.withColumn("_r", row_number().over(wRank).cast("long"))
    // bucket offsets: totals per bucket, cumulated in hex order. The
    // cumulative window runs over 16^bucketChars rows — O(config), like an
    // inlined-centroid table — and the result broadcasts back.
    // single-partition by design: O(16^bucketChars) rows by construction
    // (EliminateWindowPartitions strips the lit(0) spec, so the window runs
    // unpartitioned — the intended O(config) shape; the session mutes
    // WindowExecBase's advisory WARN, see Verify.session)
    val wOff = Window.partitionBy(lit(0)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = ranked.groupBy(col("_b")).agg(count(lit(1)).as("_n"))
      .withColumn("_off", sum(col("_n")).over(wOff) - col("_n"))
      .select(col("_b"), col("_off"))
    ranked.join(broadcast(offsets), Seq("_b"))
      .withColumn("pos", col("_off") + col("_r") - 1)
      .drop("_h", "_b", "_r", "_off")
  }
}
