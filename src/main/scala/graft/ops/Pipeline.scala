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
}
