package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter set membership at corpus scale — driver API over the
  * native [[graft.functions.BloomBuild]] aggregate and
  * [[graft.functions.BloomMaybeContains]] probe.
  *
  * The 100 TB use case is DECONTAMINATION: remove every corpus document
  * whose key (normalized text, URL, fingerprint) appears in a benchmark /
  * blocklist set. The exact formulation is an anti-join that shuffles the
  * FULL corpus on the key; with a Bloom filter built over the small dirty
  * side, every corpus partition filters locally and only the maybe-hits
  * (true matches + the configured false-positive residue) reach the exact
  * verification join. No false negatives means the short-cut is LOSSLESS:
  * `probe == false` PROVES the row is clean, which is why
  * `bloom_decontaminate` can sit under the same exact DuckDB oracle as the
  * brute anti-join.
  */
object BloomOps {
  /** Distributed build, collected to one blob — O(numBits/8) driver bytes,
    * the bounded broadcast-setup discipline (same as centroids/codebooks).
    */
  def build(dirty: DataFrame, key: Column, numBits: Int, numHashes: Int): Array[Byte] =
    dirty.agg(call_function("bloom_build", key, lit(numBits), lit(numHashes))
      .as("bf")).collect()(0).getAs[Array[Byte]](0)

  /** Per-row membership probe against a built blob; stays inside
    * whole-stage codegen (the blob decodes once per task, not per row).
    */
  def maybeContains(blob: Array[Byte], key: Column): Column =
    call_function("bloom_maybe_contains", lit(blob), key)

  /** Lossless Bloom-accelerated anti-join: rows whose key probes false are
    * provably clean and never shuffle; maybe-hits are verified with the
    * exact anti-join. Two corpus scans, but the shuffle shrinks from
    * O(corpus) to O(true hits + fpr * corpus) — the trade a 100 TB corpus
    * wants, since scans are parallel-cheap and the shuffle is the
    * bottleneck.
    */
  def decontaminate(corpus: DataFrame, dirty: DataFrame, keyCol: String,
                    numBits: Int, numHashes: Int): DataFrame = {
    val blob = build(dirty, col(keyCol), numBits, numHashes)
    // a NULL key probes NULL; without the coalesce such a row would fail
    // BOTH branch filters and silently vanish — a null-keyed row cannot
    // match the blocklist, so it is clean
    val maybe = coalesce(maybeContains(blob, col(keyCol)), lit(false))
    val clean = corpus.filter(!maybe)
    val verified = corpus.filter(maybe)
      .join(dirty.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    clean.unionByName(verified)
  }

  /** False-positive accounting for the blob over a probe corpus: exact
    * true-match count (oracle-checkable), the no-false-negatives theorem,
    * and the false-positive count against a caller-supplied ceiling.
    */
  def fprReport(corpus: DataFrame, dirty: DataFrame, keyCol: String,
                numBits: Int, numHashes: Int, fpCeiling: Long): DataFrame = {
    val blob = build(dirty, col(keyCol), numBits, numHashes)
    val maybe = maybeContains(blob, col(keyCol))
    val truth = dirty.select(col(keyCol)).distinct()
      .withColumn("_dirty", lit(true))
    corpus.withColumn("_maybe", maybe)
      .join(truth, Seq(keyCol), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("_dirty").isNotNull, 1L).otherwise(0L)).as("n_true"),
        sum(when(col("_dirty").isNotNull && !col("_maybe"), 1L).otherwise(0L))
          .as("n_false_neg"),
        sum(when(col("_dirty").isNull && col("_maybe"), 1L).otherwise(0L))
          .as("n_false_pos"))
      .select(col("n_probes"), col("n_true"),
        (col("n_false_neg") === 0L).as("no_false_negatives"),
        (col("n_false_pos") <= fpCeiling).as("fp_within_ceiling"))
  }
}
