package graft.queries

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators as driver-contract queries + DuckDB
  * oracles, over `documents` and `embeddings`.
  *
  * Oracle discipline: every float-valued result is a fixed IEEE expression
  * tree mirrored verbatim between the Column code and the SQL (sequential
  * double folds for vector math, identical operation order for scores), so
  * value hashes match exactly — no tolerance-based comparison exists in the
  * driver.
  */
object OpsQueries {

  import QueryUtil.scanParallel

  private def docs(s: SparkSession, dir: String) =
    scanParallel(s.read.parquet(s"$dir/documents.parquet"), s)
  private def embs(s: SparkSession, dir: String) =
    scanParallel(s.read.parquet(s"$dir/embeddings.parquet"), s)

  val JaccardThreshold = 0.2
  val NearDupThreshold = 0.2
  // Containment (|A∩B|/min set size) runs higher than Jaccard on the same
  // pair set — 0.5 keeps only genuine doc-in-doc / heavy-overlap pairs.
  val ContainmentThreshold = 0.5
  // Hot-band caps (Dedup.capBands): chosen from measured band-df
  // distributions so they guard degenerate corpora without biting normal
  // data — minhash max band df is 8 at sf0.1, RHP max 185, simhash max 343
  // at sf0.01 (simhash bands DO run hot: 3253 at sf0.1, where the cap
  // correctly bounds the collision join). SimHashBiteCap deliberately bites
  // at sf0.01 so the capped-variant query proves the guard's semantics
  // against the mirrored oracle.
  val MinHashMaxBandDf = 64
  val SimHashMaxBandDf = 512
  val SimHashBiteCap = 64
  val RhpMaxBandDf = 400
  val TopK = 10
  val NProbe = 2
  val NCentroids = 8
  val KmIters = 2   // fixed Lloyd iterations for emb_kmeans (oracle mirrors each)
  val EmbDim = 64   // embedding width, constant across SFs (TESTDATA.md)
  val PlaneBase = 8   // RHP-LSH hyperplanes: corpus vectors [PlaneBase, PlaneBase+NPlanes)
  val NPlanes = 16
  val NearDupLshThreshold = 0.3 // higher bar than label blocking: LSH candidates skew similar
  val PackShards = 32
  val PackBudget = 256
  val TfidfK = 5
  // Cross-doc span dedup: 5-gram spans, duplicated = appears in >= 2 docs.
  val SpanN = 5
  val SpanMinDf = 2
  // Incremental dedup split: history = docs whose md5("inc:"+id) first hex
  // char < 'd' (~13/16 of the corpus), batch = the rest — a deterministic
  // stand-in for "corpus so far" vs "today's arriving shard".
  val IncSplitHex = "d"
  // Context-window chunking: 400-char chunks, 50-char overlap (step 350).
  val ChunkSize = 400
  val ChunkOverlap = 50
  // Epoch shuffle: seeded permutation cut into 8 training shards.
  val ShuffleSeed = "ep0"
  val ShuffleShards = 8L
  // Product quantization: 4 subspaces of 16 dims, 8-centroid codebooks.
  val PqM = 4
  val PqSub: Int = EmbDim / PqM
  val PqK = 8
  // PageRank: three affine link generators (p, c) and the fixed iteration
  // count — mirrored constant-for-constant by the generated oracle CTEs.
  val PrLinks: Seq[(Long, Long)] = Seq((7L, 1L), (13L, 5L), (31L, 11L))
  val PrIters = 10
  // Triangle census: ring + chord generators guarantee ~n triangles; the
  // scrambler adds irregular degree structure.
  val TriLinks: Seq[(Long, Long)] = Seq((1L, 1L), (1L, 2L), (7L, 3L))

  /** The RHP hyperplanes: corpus vectors [PlaneBase, PlaneBase+NPlanes),
    * in id order — ONE definition for every RHP consumer (top-k, near-dup,
    * clusters) so the index can never drift between them (the oracle-side
    * mirror is `rhpCtes`).
    */
  private def rhpPlanes(e: DataFrame): Seq[Array[Float]] =
    e.filter(col("vec_id") >= PlaneBase && col("vec_id") < PlaneBase + NPlanes)
      .orderBy("vec_id").select("embedding")
      .collect().map(_.getSeq[Float](0).toArray).toSeq

  /** recall@k of an approximate (query_id, vec_id) ranking against the
    * exact brute force — ONE harness for every index evaluation
    * (ann_ivf_recall, ann_pq_recall; oracle mirror is `recallSql`).
    */
  private def recallVsBf(bf: DataFrame, approx: DataFrame): DataFrame =
    bf.join(approx.select(col("query_id"), col("vec_id")).withColumn("hit", lit(1)),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg((coalesce(sum(col("hit")), lit(0)) / lit(TopK.toDouble)).as("recall"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(docs(s, dir))
        .select("doc_id", "n_tokens", "n_bpe", "n_chars_calc")),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(docs(s, dir))
        .select("doc_id", "n_tokens", "punct_ratio", "stop_ratio", "quality")),

    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir))
        .select("doc_id", "score_en", "score_es", "score_fr", "lang_pred")),

    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.normalized(col("text")).as("norm_text"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))),

    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minHashCandidates(docs(s, dir), Some(MinHashMaxBandDf))),

    "dedup_simhash" -> ((s, dir) => Dedup.simHash(docs(s, dir))),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(docs(s, dir), JaccardThreshold)),

    "dedup_ngram_jaccard_t07" -> ((s, dir) =>
      // the BRUTE inverted-index join at t=0.7 — same threshold as
      // dedup_prefix_jaccard, so the bench demonstrates the prefix filter
      // beating the join it exists to replace in its winning regime
      // (identical output, identical oracle string; only the plan differs)
      Dedup.ngramJaccard(docs(s, dir), 0.7)),

    "dedup_prefix_jaccard" -> ((s, dir) =>
      // PPJoin prefix filtering at the production-style 0.7 threshold:
      // candidates only from each doc's ~30% rarest shingles, verified on
      // full sets — the oracle is the BRUTE inverted-index join at the
      // same threshold, so the gate proves the filter is lossless (same
      // pairs, same stats, same scores)
      Dedup.prefixJaccard(docs(s, dir), tNum = 7, tDen = 10)),

    "dedup_containment" -> ((s, dir) =>
      // doc-in-doc measure: |A∩B| / min(|A|,|B|) — catches full embeddings
      // that Jaccard's symmetric denominator dilutes away
      Dedup.containmentPairs(docs(s, dir), ContainmentThreshold)),

    "dedup_minhash_est" -> ((s, dir) => {
      // estimator-quality evaluation (the dedup analogue of the ANN recall
      // queries): MinHash-estimated Jaccard (matching signature fraction)
      // against the exact shingle Jaccard, per verified pair
      val d = docs(s, dir)
      // NOT materialized: the signature is a per-row array fold with no
      // exchange since r18, so re-evaluating it under each join side is
      // two cheap map passes — the scratch-parquet staging this used to
      // do (from when signatures cost an explode + groupBy exchange) paid
      // a write plus two reads per run and measured SLOWER (two A/B
      // best-of-3 pairs: staged 2.16/2.75 s vs recomputed 1.79/1.21 s, r18)
      val sigs = Dedup.minHashSignatures(d)
      val k = Dedup.MinHashK
      val sa = sigs.select(col("doc_id").as("doc_a") +:
        (0 until k).map(i => col(s"m$i").as(s"_a$i")): _*)
      val sb = sigs.select(col("doc_id").as("doc_b") +:
        (0 until k).map(i => col(s"m$i").as(s"_b$i")): _*)
      val est = (0 until k)
        .map(i => when(col(s"_a$i") === col(s"_b$i"), 1).otherwise(0))
        .reduce(_ + _) / lit(k.toDouble)
      Dedup.minHashVerified(d, JaccardThreshold, Some(MinHashMaxBandDf))
        .join(sa, "doc_a").join(sb, "doc_b")
        .select(col("doc_a"), col("doc_b"), col("jaccard"), est.as("est_jaccard"))
    }),

    "dedup_simhash_pairs" -> ((s, dir) =>
      // hamming <= 3 is the pigeonhole-complete threshold for 4 bands
      Dedup.simHashPairs(docs(s, dir), maxHamming = 3, Some(SimHashMaxBandDf))),

    "dedup_simhash_pairs_capped" -> ((s, dir) =>
      // tight-cap variant: the cap bites on real data here (simhash band df
      // reaches 343 at sf0.01), proving the hot-band guard's drop semantics
      // match the oracle's where it matters
      Dedup.simHashPairs(docs(s, dir), maxHamming = 3, Some(SimHashBiteCap))),

    "dedup_minhash_verified" -> ((s, dir) =>
      Dedup.minHashVerified(docs(s, dir), JaccardThreshold, Some(MinHashMaxBandDf))),

    "dedup_spans" -> ((s, dir) =>
      Dedup.spanStats(docs(s, dir), SpanN, SpanMinDf)),

    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val split = substring(md5(concat(lit("inc:"), col("doc_id").cast("string"))), 1, 1)
      Dedup.incrementalNearDups(
        d.filter(split < IncSplitHex), d.filter(split >= IncSplitHex),
        Some(MinHashMaxBandDf))
    }),

    "dedup_streaming_index" -> ((s, dir) => {
      // Persistent-index streaming dedup ([[graft.ops.StreamingDedup]]):
      // the corpus arrives as four doc_id-range batches, each deduped
      // against a fingerprint index a ManifestStore maintains across
      // batches (merge-on-read inserts: hash keys scatter across every
      // file range, the copy-on-write worst case). After ingest the index
      // must map every fingerprint to its GLOBALLY first document — the
      // incremental==global theorem the first-wins window oracle pins.
      // Exactly-once batch ids make the warm re-run (bench best-of-3, a
      // restarted driver) a pure read.
      val st = new graft.cdc.ManifestStore(
        QueryUtil.scratchDir(
          s"dedup_idx_${dir.replaceAll("[^A-Za-z0-9]", "_")}"), s, "fp")
      val d = docs(s, dir)
      val fp = md5(col("text"))
      if (!st.exists) {
        StreamingDedup.init(st, s)
        val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
        val span = maxId / 4 + 1
        (0L until 4L).foreach { i =>
          val b = d.filter(col("doc_id") >= i * span &&
            col("doc_id") < (i + 1) * span)
          StreamingDedup.processBatch(st, b, "doc_id", fp, batchId = i)
        }
      }
      StreamingDedup.verdictsFromIndex(st, d, "doc_id", fp)
    }),

    "dedup_streaming_bands" -> ((s, dir) => {
      // The fuzzy half of the persistent-index pipeline: a MinHash BAND
      // index maintained across four doc_id-range batches; a document is
      // a candidate near-dup iff any of its bands was first claimed by an
      // earlier document. No pairwise join anywhere — the oracle's global
      // band-min window must equal the incrementally built index's
      // verdicts.
      val st = new graft.cdc.ManifestStore(
        QueryUtil.scratchDir(
          s"dedup_bidx_${dir.replaceAll("[^A-Za-z0-9]", "_")}"), s, "bk")
      val d = docs(s, dir)
      if (!st.exists) {
        StreamingDedup.initBands(st, s)
        val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
        val span = maxId / 4 + 1
        (0L until 4L).foreach { i =>
          val b = d.filter(col("doc_id") >= i * span &&
            col("doc_id") < (i + 1) * span)
          StreamingDedup.processBandBatch(st, b, batchId = i)
        }
      }
      StreamingDedup.verdictsFromBandIndex(st, d)
    }),

    "dedup_streaming_ttl" -> ((s, dir) => {
      // Retention on the persistent fingerprint index
      // ([[graft.ops.StreamingDedup.expire]]): four doc_id-range batches
      // claim with claimTs = batch index, then claims from the first two
      // batches expire (deletion-vector deleteWhere — O(matches) write).
      // The surviving index is exactly the fps first seen in batches 2-3,
      // with their first claimant — expiry removes whole claims, never
      // reassigns one, so the windowed oracle restricted to post-window
      // fps must match. Docs whose fp expired drop out (inner join), the
      // re-admission contract.
      val st = new graft.cdc.ManifestStore(
        QueryUtil.scratchDir(
          s"dedup_ttl_${dir.replaceAll("[^A-Za-z0-9]", "_")}"), s, "fp")
      val d = docs(s, dir)
      val fp = md5(col("text"))
      if (!st.exists) {
        StreamingDedup.init(st, s)
        val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
        val span = maxId / 4 + 1
        (0L until 4L).foreach { i =>
          val b = d.filter(col("doc_id") >= i * span &&
            col("doc_id") < (i + 1) * span)
          StreamingDedup.processBatch(st, b, "doc_id", fp, batchId = i,
            claimTs = i)
        }
        StreamingDedup.expire(st, olderThan = 2L, batchId = 4L)
      }
      StreamingDedup.verdictsFromIndex(st, d, "doc_id", fp)
    }),

    "dedup_clusters" -> ((s, dir) =>
      // pairwise hits -> canonical dedup groups (connected components)
      Dedup.dedupClusters(
        Dedup.minHashVerified(docs(s, dir), JaccardThreshold, Some(MinHashMaxBandDf)))),

    "ann_cosine_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") % 100 === 0), TopK)
    }),

    "ann_ivf_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < NCentroids),
        e.filter(col("vec_id") % 100 === 0), TopK, NProbe)
    }),

    "emb_kmeans" -> ((s, dir) =>
      Similarity.kMeans(embs(s, dir), NCentroids, KmIters)),

    "emb_pq_codes" -> ((s, dir) =>
      // product quantization: m per-subspace codebooks, one projection pass
      // for code assignment (no shuffle — inlined codebooks)
      Similarity.pqCodes(embs(s, dir), PqM, EmbDim, PqK, KmIters)),

    "ann_pq_topk" -> ((s, dir) => {
      // PQ-ADC search: queries rank the CODES table via codebook
      // reconstruction — corpus vectors untouched at search time
      val e = embs(s, dir)
      Similarity.pqTopK(e, e.filter(col("vec_id") % 100 === 0),
        PqM, EmbDim, PqK, KmIters, TopK)
    }),

    "ann_pq_recall" -> ((s, dir) => {
      // index-quality evaluation: recall@k of the PQ-ADC ranking against
      // the exact brute force, per query (shared recallVsBf harness)
      val e = embs(s, dir)
      val queries = e.filter(col("vec_id") % 100 === 0)
      recallVsBf(Similarity.bruteForceTopK(e, queries, TopK),
        Similarity.pqTopK(e, queries, PqM, EmbDim, PqK, KmIters, TopK))
    }),

    "emb_semdedup" -> ((s, dir) =>
      // SemDeDup: k-means clustering + within-cluster cosine dedup; keeps
      // the member least similar to its centroid (paper's diversity rule)
      Similarity.semDeDup(embs(s, dir), NCentroids, KmIters, NearDupThreshold)),

    "pipeline_chunk" -> ((s, dir) =>
      Pipeline.chunk(docs(s, dir), ChunkSize, ChunkOverlap)),

    "pipeline_pack_concat" -> ((s, dir) => {
      // bin materialization: the packed training rows themselves — docs of
      // each (shard, bin) joined in id order with an EOS separator. One
      // keyed join back to text + one (shard, bin) aggregation; ordering
      // inside the bin is pinned by array_sort on (doc_id, text) structs so
      // the concatenation is deterministic under any partitioning.
      val d = docs(s, dir)
      Pipeline.packSequences(d, PackShards, PackBudget)
        .join(d.select("doc_id", "text"), Seq("doc_id"))
        .groupBy("shard", "bin_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
          array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")), "<eos>").as("packed_text"))
    }),

    "pipeline_shuffle" -> ((s, dir) =>
      // seeded epoch shuffle with a contiguous global position (two-pass
      // scalable indexing — no single-partition window) cut into shards
      Pipeline.globalShuffle(docs(s, dir).select("doc_id"), "doc_id", ShuffleSeed)
        .withColumn("shard", pmod(col("pos"), lit(ShuffleShards)))
        .select("doc_id", "pos", "shard")),

    "ann_ivf_recall" -> ((s, dir) => {
      // index-quality evaluation: recall@k of the IVF probe against the
      // exact brute force, per query (shared recallVsBf harness)
      val e = embs(s, dir)
      val queries = e.filter(col("vec_id") % 100 === 0)
      recallVsBf(Similarity.bruteForceTopK(e, queries, TopK),
        Similarity.ivfTopK(e, e.filter(col("vec_id") < NCentroids),
          queries, TopK, NProbe))
    }),

    "ann_rhp_topk" -> ((s, dir) => {
      // random-hyperplane LSH: second ANN scale path (signature projection +
      // band-collision candidates + exact rerank)
      val e = embs(s, dir)
      Similarity.rhpTopK(e, rhpPlanes(e), e.filter(col("vec_id") % 100 === 0), TopK)
    }),

    "pipeline_split" -> ((s, dir) =>
      Pipeline.hashSplit(docs(s, dir), "doc_id").select("doc_id", "split")),

    "graph_pagerank" -> ((s, dir) => {
      // fixed-iteration integer PageRank over a deterministic link graph:
      // each doc links to (doc_id * p + c) % (max_id + 1) for three (p, c)
      // pairs, semi-joined back to EXISTING ids (no density assumption on
      // doc_id — edges to holes just drop, identically in the oracle's
      // inner join). All-integer ranks make the iteration bit-exact across
      // engines and partitionings; see [[graft.ops.Graph.pageRank]].
      graft.ops.Graph.pageRank(linkGraph(s, dir, PrLinks), PrIters)
        .select(col("id").as("node_id"), col("pr").as("pr_scaled"))
    }),

    "graph_triangles" -> ((s, dir) =>
      // exact triangle census via degree-ordered orientation (wedges fan
      // out only at a triangle's lowest-rank vertex — hub-safe at scale);
      // the oracle counts the same undirected graph canonically, pinning
      // that orientation changes the COST, never the count
      graft.ops.Graph.triangleStats(linkGraph(s, dir, TriLinks))),

    "pipeline_leakage_split" -> ((s, dir) => {
      // near-dups must share a split: route the hash through the dedup
      // cluster representative instead of the doc id
      val d = docs(s, dir)
      val clusters = Dedup.dedupClusters(
        Dedup.minHashVerified(d, JaccardThreshold, Some(MinHashMaxBandDf)))
      Pipeline.leakageSafeSplit(d, clusters).select("doc_id", "rep", "split")
    }),

    "pipeline_pack" -> ((s, dir) =>
      Pipeline.packSequences(docs(s, dir), PackShards, PackBudget)),

    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(docs(s, dir), TfidfK)),

    "emb_near_dup" -> ((s, dir) =>
      Similarity.nearDupPairs(embs(s, dir), "label", NearDupThreshold)),

    "emb_near_dup_lsh" -> ((s, dir) => {
      // unsupervised variant: blocking from RHP-LSH bands instead of labels
      val e = embs(s, dir)
      Similarity.nearDupPairsLsh(e, rhpPlanes(e), NearDupLshThreshold,
        maxBandDf = Some(RhpMaxBandDf))
    }),

    "emb_dedup_clusters" -> ((s, dir) => {
      // cross-family composition: embedding LSH near-dup pairs canonicalize
      // through the SAME connected-components operator the text path uses
      val e = embs(s, dir)
      val pairs = Similarity.nearDupPairsLsh(e, rhpPlanes(e), NearDupLshThreshold,
          maxBandDf = Some(RhpMaxBandDf))
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      Dedup.dedupClusters(pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
    }),

    "emb_normalize_quantize" -> ((s, dir) =>
      // scalar-per-row shape (vec_id, idx, unit_val, q8_val): the driver's
      // pandas-based compare can't hash array cells, so the unit vector is
      // exploded; q8 is recomputed per element with the same floor(x*127+.5)
      // arithmetic as Similarity.quantizeInt8.
      embs(s, dir)
        .select(col("vec_id"), Similarity.l2Normalize(col("embedding")).as("unit"))
        .select(col("vec_id"), posexplode(col("unit")).as(Seq("idx", "unit_val")))
        .select(col("vec_id"), col("idx").cast("long").as("idx"), col("unit_val"),
          floor(col("unit_val") * lit(127.0) + lit(0.5)).cast("long").as("q8_val"))),

    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(s, Multimodal.assetsFromDocuments(docs(s, dir))).toDF()),

    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.assetsFromDocuments(docs(s, dir)), 256)),

    "mm_feature_extract" -> ((s, dir) =>
      // exploded to scalar rows (driver comparator can't hash arrays)
      Multimodal.extractFeatures(s, Multimodal.assetsFromDocuments(docs(s, dir)))
        .toDF()
        .select(col("asset_id"), posexplode(col("features")).as(Seq("dim", "fval")))
        .select(col("asset_id"), col("dim").cast("long").as("dim"), col("fval"))),

    "mm_resize_plan" -> ((s, dir) =>
      Multimodal.resizePlan(
        Multimodal.decodeMeta(s, Multimodal.assetsFromDocuments(docs(s, dir)))
          .toDF(), box = 256)),

    "text_ngram_topk" -> ((s, dir) => {
      // corpus-wide top-k 3-grams: explode -> count (map-side partial agg)
      // -> global top-k. Deterministic order: count desc, ngram asc.
      val sh = docs(s, dir).select(explode(Dedup.shingles(col("text"))).as("ngram"))
      sh.groupBy("ngram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram").asc)
        .limit(50)
    }),

    "text_bm25_search" -> ((s, dir) =>
      TextAnalysis.bm25(docs(s, dir), Seq("spark", "join", "table"))),

    "pipeline_quality_filter" -> ((s, dir) => {
      // end-to-end curation pipeline: quality-score + language-ID +
      // exact-dedup composed into one selection — the operators are
      // narrow projections over one scan plus the dedup's single shuffle,
      // so Catalyst fuses the whole filter chain.
      val d = docs(s, dir)
      val scored = TextAnalysis.langId(TextAnalysis.qualityScore(d))
      val deduped = Dedup.exact(d).select("doc_id", "is_dup")
      scored.join(deduped, "doc_id")
        .filter(col("quality") >= 0.5 && col("lang_pred") === "en" && col("is_dup") === 0)
        .select(col("doc_id"), col("quality"), col("lang_pred"))
    }))

  // ------------------------------------------------------------- oracles

  /** Shared CTE: whitespace tokens of lowered text. */
  private val toksCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
      |)""".stripMargin

  /** Shared CTE: distinct 3-gram shingles per doc (docs with >= 3 tokens). */
  private val shinglesCte =
    s"""$toksCte, sh AS (
       |  SELECT doc_id,
       |         unnest(list_distinct([array_to_string(t[j:j+2], ' ')
       |                               for j in range(1, len(t) - 1)])) AS s
       |  FROM toks WHERE len(t) >= 3
       |)""".stripMargin

  private val enList = TextAnalysis.Stopwords("en").map(w => s"'$w'").mkString(", ")
  private val esList = TextAnalysis.Stopwords("es").map(w => s"'$w'").mkString(", ")
  private val frList = TextAnalysis.Stopwords("fr").map(w => s"'$w'").mkString(", ")

  private val hiHex = "('8','9','a','b','c','d','e','f')"
  private val simhashCols = (1 to 32)
    .map(b => s"sum(CASE WHEN substr(h, $b, 1) IN $hiHex THEN 1 ELSE -1 END) AS c$b")
    .mkString(",\n         ")
  private val simhashBits = (1 to 32)
    .map(b => s"(CASE WHEN c$b > 0 THEN '1' ELSE '0' END)").mkString(" || ")
  private val minhashMins = (0 until Dedup.MinHashK).map { i =>
    val src = if (i < 4) "md5(s)" else "md5('x' || s)"
    s"min(substr($src, ${(i % 4) * 8 + 1}, 8)) AS m$i"
  }.mkString(", ")
  private val bandSelects = (0 until Dedup.MinHashK / 2)
    .map(b => s"SELECT doc_id, $b AS band, m${2 * b} || m${2 * b + 1} AS key FROM sig")
    .mkString("\n  UNION ALL ")

  /** Hot-band cap mirror of [[Dedup.capBands]]: keep only (band, key)
    * groups with at most `cap` members. Appended after a `bands0` CTE,
    * yields the filtered `bands`.
    */
  private def bandCapCtes(cap: Int) =
    s""", bkeep AS (
       |  SELECT band, key FROM bands0 GROUP BY band, key HAVING count(*) <= $cap
       |), bands AS (
       |  SELECT bands0.* FROM bands0 JOIN bkeep USING (band, key)
       |)""".stripMargin

  private val simBandSelects = (0 until 4)
    .map(b => s"SELECT doc_id, simhash, $b AS band, substr(simhash, ${8 * b + 1}, 8) AS key FROM sig")
    .mkString("\n  UNION ALL ")
  private val hammingSql =
    "bit_count(xor(CAST('0b' || sa AS BIGINT), CAST('0b' || sb AS BIGINT)))"

  /** list_reduce sequential double fold — mirrors [[Similarity.dot]]
    * (Spark folds from 0.0; list_reduce folds from the first element —
    * identical because 0.0 + x == x).
    */
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_zip($a, $b).apply(p -> p[1] * p[2]), (x, y) -> x + y)"
  private def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
  private val embCte =
    """WITH e AS (
      |  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v
      |  FROM embeddings
      |)""".stripMargin

  /** SimHash near-dup pairs oracle, parameterized by the hot-band cap —
    * the headline query uses a no-bite cap, the `_capped` variant a cap
    * that drops real hot bands (mirror of [[Dedup.simHashPairs]]).
    */
  private def simHashPairsSql(cap: Int) =
    s"""$toksCte, tk AS (
       |  SELECT doc_id, md5(unnest(t)) AS h FROM toks
       |), c AS (
       |  SELECT doc_id,
       |         $simhashCols
       |  FROM tk GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, $simhashBits AS simhash FROM c
       |), bands0 AS (
       |  $simBandSelects
       |)${bandCapCtes(cap)}, pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS sa, b.simhash AS sb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b, CAST($hammingSql AS BIGINT) AS hamming
       |FROM pairs
       |WHERE $hammingSql <= 3""".stripMargin

  /** Shared MinHash-verified-pairs structure (appended after [[shinglesCte]])
    * — used by the verified-dedup oracle and the cluster oracle so the pair
    * definition can never drift between them.
    */
  private lazy val verifiedCtes =
    s""", sig AS (
       |  SELECT doc_id, $minhashMins FROM sh GROUP BY doc_id
       |), bands0 AS (
       |  $bandSelects
       |)${bandCapCtes(MinHashMaxBandDf)}, cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
       |), shared AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS shared
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
       |  GROUP BY 1, 2
       |), verified AS (
       |  SELECT doc_a, doc_b, shared / (na.n + nb.n - shared) AS jaccard
       |  FROM shared
       |  JOIN sizes na ON na.doc_id = doc_a
       |  JOIN sizes nb ON nb.doc_id = doc_b
       |  WHERE shared / (na.n + nb.n - shared) >= ${JaccardThreshold}
       |)""".stripMargin

  /** Shared RHP-LSH structure (planes, bit signatures, band keys) — used by
    * both the ann_rhp_topk and emb_near_dup_lsh oracles so the index
    * definition can never drift between them (mirror of
    * [[Similarity.rhpSignature]] + its banding).
    */
  private lazy val rhpCtes =
    s""", planes AS (
       |  SELECT vec_id - ${PlaneBase} AS pid, v AS pv FROM e
       |  WHERE vec_id >= ${PlaneBase} AND vec_id < ${PlaneBase + NPlanes}
       |), sig AS (
       |  SELECT e.vec_id,
       |         string_agg(CASE WHEN ${dotSql("v", "pv")} >= 0.0
       |                         THEN '1' ELSE '0' END, '' ORDER BY pid) AS sg
       |  FROM e CROSS JOIN planes GROUP BY e.vec_id
       |), bands0 AS (
       |  SELECT vec_id, b AS band, substr(sg, b * 4 + 1, 4) AS key
       |  FROM sig CROSS JOIN (SELECT unnest(range(${NPlanes / 4})) AS b) _b
       |)""".stripMargin

  /** Brute inverted-index exact-Jaccard pairs at a given threshold — the
    * oracle for the full join (`dedup_ngram_jaccard`, at the suite-wide
    * 0.2) and for the prefix-filtered join (`dedup_prefix_jaccard`, at the
    * production-style 0.7), which must reproduce the brute result exactly
    * at ITS threshold.
    */
  private def ngramJaccardSqlAt(thr: String): String =
    s"""$shinglesCte, sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, shared, na.n AS n_a, nb.n AS n_b,
       |       shared / (na.n + nb.n - shared) AS jaccard
       |FROM pairs
       |JOIN sizes na ON na.doc_id = doc_a
       |JOIN sizes nb ON nb.doc_id = doc_b
       |WHERE shared / (na.n + nb.n - shared) >= $thr""".stripMargin
  private lazy val ngramJaccardSql: String = ngramJaccardSqlAt(s"$JaccardThreshold")

  /** Deterministic link graph over EXISTING doc ids: src doc_id ->
    * (doc_id * p + c) % (max_id + 1) for each (p, c), semi-joined back to
    * real ids. Shared by the graph queries; `linkCtes` is its oracle
    * mirror.
    */
  private def linkGraph(s: SparkSession, dir: String,
                        links: Seq[(Long, Long)]): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    val maxPlus1 = d.agg(max("doc_id")).head().getLong(0) + 1 // O(1) driver scalar
    val raw = links.map { case (p, c) =>
      d.select(col("doc_id").as("src"),
        ((col("doc_id") * p + c) % maxPlus1).as("dst"))
    }.reduce(_ unionAll _)
    raw.join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      .select("src", "dst")
  }

  private def linkCtes(links: Seq[(Long, Long)]): String = {
    val sels = links.map { case (p, c) =>
      s"SELECT doc_id AS src, (doc_id * $p + $c) % m.m AS dst FROM d CROSS JOIN m"
    }.mkString("\n    UNION ALL\n    ")
    s"""WITH d AS (SELECT doc_id FROM documents),
       |m AS (SELECT max(doc_id) + 1 AS m FROM d),
       |e AS (
       |  SELECT src, dst FROM (
       |    $sels
       |  ) r WHERE dst IN (SELECT doc_id FROM d)
       |)""".stripMargin
  }

  /** Generated PageRank iteration CTEs — the same link generators, integer
    * rank scale, floor divisions and damping formula as
    * [[graft.ops.Graph.pageRank]], constant for constant. Ranks stay
    * BIGINT through every CTE (DuckDB sums to HUGEINT; the cast brings
    * each iteration back to the engine's type).
    */
  private lazy val prOracle: String = {
    def step(i: Int) =
      s""", pr$i AS (
         |  SELECT nodes.id,
         |         CAST(base.b + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes CROSS JOIN base LEFT JOIN (
         |    SELECT dst, sum(pr // deg) AS s
         |    FROM e JOIN pr${i - 1} ON e.src = pr${i - 1}.id JOIN deg USING (src)
         |    GROUP BY dst
         |  ) c ON nodes.id = c.dst
         |)""".stripMargin
    linkCtes(PrLinks) +
    s""",
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |cnt AS (SELECT count(*) AS n FROM nodes),
       |base AS (SELECT CAST((1000000000000 * 15) // (100 * n) AS BIGINT) AS b FROM cnt),
       |pr0 AS (SELECT id, CAST(1000000000000 // n AS BIGINT) AS pr
       |        FROM nodes CROSS JOIN cnt)""".stripMargin +
      (1 to PrIters).map(step).mkString +
      s"\nSELECT id AS node_id, pr AS pr_scaled FROM pr$PrIters"
  }

  /** Shared IVF structure (centroids, assignment, query probes) — used by
    * both the top-k oracle and the recall oracle so the index definition
    * can never drift between them.
    */
  private lazy val ivfCtes =
    s""", cent AS (
       |  SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < ${NCentroids}
       |), assign AS (
       |  SELECT vec_id, v, centroid_id,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY ${cosSql("v", "cv")} DESC, centroid_id ASC) AS crank
       |  FROM e CROSS JOIN cent
       |  QUALIFY crank = 1
       |), probes AS (
       |  SELECT q.vec_id AS query_id, q.v AS qv, centroid_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY ${cosSql("q.v", "cv")} DESC, centroid_id ASC) AS prank
       |  FROM e q CROSS JOIN cent WHERE q.vec_id % 100 = 0
       |  QUALIFY prank <= ${NProbe}
       |)""".stripMargin

  /** K-means Lloyd-iteration CTE generator, shared by every
    * kmeans-family oracle (full-vector clustering AND the per-subspace PQ
    * codebooks — one definition, no drift): CTEs `${p}c0..${p}c$iters`
    * over the list expression `vExpr` (a slice of `e.v`, or `v` itself) —
    * decimal-exact dimension sums, mean rounded to 4, empty clusters keep
    * their previous centroid, mirroring [[Similarity.kMeansCentroids]].
    */
  private def kmCtesFor(p: String, vExpr: String, k: Int, iters: Int,
                        dim: Int): String = {
    def step(i: Int, prevC: String) =
      s""", ${p}a$i AS (
         |  SELECT vec_id, $vExpr AS sv, centroid_id,
         |         row_number() OVER (PARTITION BY vec_id
         |                            ORDER BY ${cosSql(vExpr, "cv")} DESC, centroid_id ASC) AS r
         |  FROM e CROSS JOIN $prevC QUALIFY r = 1
         |), ${p}u$i AS (
         |  SELECT centroid_id, i,
         |         round(CAST(sum(CAST(sv[i] AS DECIMAL(27,9))) AS DOUBLE) / count(*), 4) AS m
         |  FROM ${p}a$i CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS i) dims
         |  GROUP BY centroid_id, i
         |), ${p}c$i AS (
         |  SELECT $prevC.centroid_id,
         |         CASE WHEN count(${p}u$i.m) = 0 THEN any_value($prevC.cv)
         |              ELSE list(${p}u$i.m ORDER BY ${p}u$i.i) END AS cv
         |  FROM $prevC LEFT JOIN ${p}u$i USING (centroid_id)
         |  GROUP BY $prevC.centroid_id
         |)""".stripMargin
    s""", ${p}c0 AS (
       |  SELECT vec_id AS centroid_id, $vExpr AS cv FROM e ORDER BY vec_id LIMIT $k
       |)""".stripMargin +
      (1 to iters).map(i => step(i, s"${p}c${i - 1}")).mkString
  }

  private lazy val kmCtes: String = kmCtesFor("", "v", NCentroids, KmIters, EmbDim)

  /** Shared PQ oracle structure (per-subspace slices, codebook CTEs, code
    * CTEs, code joins) — used by BOTH emb_pq_codes and ann_pq_topk so the
    * two oracles cannot drift on what a code is (mirror of the Scala-side
    * `pqCodesFor` sharing).
    */
  private lazy val pqSlices: Seq[(Int, String)] =
    (0 until PqM).map(j => j -> s"v[${j * PqSub + 1}:${(j + 1) * PqSub}]")
  private lazy val pqCodebookCtes: String = pqSlices.map { case (j, sl) =>
    kmCtesFor(s"s${j}_", sl, PqK, KmIters, PqSub)
  }.mkString
  private lazy val pqCodeCtes: String = pqSlices.map { case (j, sl) =>
    s""", f$j AS (
       |  SELECT vec_id, centroid_id AS code$j,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY ${cosSql(sl, "cv")} DESC, centroid_id ASC) AS r
       |  FROM e CROSS JOIN s${j}_c$KmIters QUALIFY r = 1
       |)""".stripMargin
  }.mkString
  private lazy val pqCodeJoins: String =
    (1 until PqM).map(j => s"JOIN f$j USING (vec_id)").mkString(" ")
  private lazy val pqReconCte: String = {
    val reconJoins = (0 until PqM).map(j =>
      s"JOIN s${j}_c$KmIters c$j ON c$j.centroid_id = f$j.code$j").mkString("\n  ")
    s""", recon AS (
       |  SELECT f0.vec_id, ${(0 until PqM).map(j => s"c$j.cv AS cv$j").mkString(", ")}
       |  FROM f0 $pqCodeJoins
       |  $reconJoins
       |)""".stripMargin
  }
  /** RHP band-capped candidate pairs + exact-verified near-dup pairs —
    * shared by the emb_near_dup_lsh and emb_dedup_clusters oracles (one
    * pair definition, mirror of the Scala `nearDupPairsLsh` call both
    * queries share).
    */
  private lazy val rhpPairCtes: String =
    s"""${bandCapCtes(RhpMaxBandDf)}, cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
       |), epairs AS (
       |  SELECT vec_a, vec_b, ${cosSql("ea.v", "eb.v")} AS cos
       |  FROM cand
       |  JOIN e ea ON ea.vec_id = vec_a
       |  JOIN e eb ON eb.vec_id = vec_b
       |  WHERE ${cosSql("ea.v", "eb.v")} >= ${NearDupLshThreshold}
       |)""".stripMargin

  /** Exact brute-force top-k CTE + the recall-vs-bf scaffold — shared by
    * every index-evaluation oracle (mirror of the Scala `recallVsBf`).
    */
  private lazy val bfCte =
    s""", bf AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY ${cosSql("q.v", "c.v")} DESC, c.vec_id ASC) AS rank
       |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id % 100 = 0
       |  QUALIFY rank <= ${TopK}
       |)""".stripMargin

  private def recallSql(approxCte: String): String =
    s"""SELECT bf.query_id,
       |       coalesce(sum($approxCte.hit), 0) / ${TopK}.0 AS recall
       |FROM bf LEFT JOIN $approxCte
       |  ON bf.query_id = $approxCte.query_id AND bf.vec_id = $approxCte.vec_id
       |GROUP BY 1""".stripMargin

  /** ADC cosine of query q against reconstruction r — same left-assoc
    * reduction order as the Column code in `Similarity.pqTopK`.
    */
  private lazy val pqCosExpr: String = {
    val dots = pqSlices.map { case (j, sl) => dotSql(s"q.$sl", s"r.cv$j") }
      .mkString(" + ")
    val norms = (0 until PqM).map(j => dotSql(s"r.cv$j", s"r.cv$j")).mkString(" + ")
    s"($dots) / (sqrt(${dotSql("q.v", "q.v")}) * sqrt($norms))"
  }

  val oracles: Map[String, String] = Map(
    "emb_kmeans" ->
      s"""$embCte$kmCtes, af AS (
         |  SELECT vec_id, centroid_id, ${cosSql("v", "cv")} AS cos,
         |         row_number() OVER (PARTITION BY vec_id
         |                            ORDER BY ${cosSql("v", "cv")} DESC, centroid_id ASC) AS r
         |  FROM e CROSS JOIN c$KmIters QUALIFY r = 1
         |)
         |SELECT vec_id, centroid_id AS cluster_id, round(cos, 6) AS cos_to_centroid
         |FROM af""".stripMargin,

    "emb_semdedup" ->
      s"""$embCte$kmCtes, af AS (
         |  SELECT vec_id, v, centroid_id, round(${cosSql("v", "cv")}, 6) AS cc,
         |         row_number() OVER (PARTITION BY vec_id
         |                            ORDER BY ${cosSql("v", "cv")} DESC, centroid_id ASC) AS r
         |  FROM e CROSS JOIN c$KmIters QUALIFY r = 1
         |), dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM af a JOIN af b ON a.centroid_id = b.centroid_id
         |    AND (a.cc < b.cc OR (a.cc = b.cc AND a.vec_id < b.vec_id))
         |  WHERE ${cosSql("a.v", "b.v")} >= $NearDupThreshold
         |)
         |SELECT vec_id, centroid_id AS cluster_id, cc AS cos_to_centroid
         |FROM af WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin,

    "emb_pq_codes" ->
      s"""$embCte$pqCodebookCtes$pqCodeCtes
         |SELECT vec_id, ${(0 until PqM).map(j => s"code$j").mkString(", ")}
         |FROM f0 $pqCodeJoins""".stripMargin,

    "ann_pq_topk" ->
      s"""$embCte$pqCodebookCtes$pqCodeCtes$pqReconCte
         |SELECT query_id, vec_id, rank, cos FROM (
         |  SELECT q.vec_id AS query_id, r.vec_id, $pqCosExpr AS cos,
         |         row_number() OVER (PARTITION BY q.vec_id
         |                            ORDER BY $pqCosExpr DESC, r.vec_id ASC) AS rank
         |  FROM e q JOIN recon r ON r.vec_id <> q.vec_id
         |  WHERE q.vec_id % 100 = 0
         |) WHERE rank <= $TopK""".stripMargin,

    "ann_pq_recall" ->
      s"""$embCte$pqCodebookCtes$pqCodeCtes$pqReconCte$bfCte, pqk AS (
         |  SELECT q.vec_id AS query_id, r.vec_id, 1 AS hit,
         |         row_number() OVER (PARTITION BY q.vec_id
         |                            ORDER BY $pqCosExpr DESC, r.vec_id ASC) AS rank
         |  FROM e q JOIN recon r ON r.vec_id <> q.vec_id
         |  WHERE q.vec_id % 100 = 0
         |  QUALIFY rank <= ${TopK}
         |)
         |${recallSql("pqk")}""".stripMargin,

    "pipeline_chunk" ->
      s"""WITH ch AS (
         |  SELECT doc_id, text,
         |         unnest(range(CAST(greatest(1, ceil((len(text) - $ChunkOverlap) / ${ChunkSize - ChunkOverlap}.0)) AS BIGINT))) AS chunk_id
         |  FROM documents
         |)
         |SELECT doc_id, chunk_id,
         |       substring(text, CAST(chunk_id * ${ChunkSize - ChunkOverlap} + 1 AS INT), $ChunkSize) AS chunk_text
         |FROM ch""".stripMargin,

    "pipeline_shuffle" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY md5('$ShuffleSeed:' || doc_id), doc_id) - 1 AS BIGINT) AS pos
         |  FROM documents
         |)
         |SELECT doc_id, pos, pos % $ShuffleShards AS shard FROM p""".stripMargin,

    "text_token_stats" ->
      """SELECT doc_id, len(string_split_regex(lower(text), '\s+')) AS n_tokens,
        |       len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+')) AS n_bpe,
        |       len(text) AS n_chars_calc
        |FROM documents""".stripMargin,

    "text_quality" ->
      s"""$toksCte
         |SELECT doc_id, len(t) AS n_tokens,
         |  (len(text) - len(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'))) / len(text) AS punct_ratio,
         |  len(list_filter(t, x -> x IN ($enList))) / len(t) AS stop_ratio,
         |  0.3 * least(len(t) / 100.0, 1.0)
         |    + 0.3 * (1.0 - (len(text) - len(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'))) / len(text))
         |    + 0.4 * least((len(list_filter(t, x -> x IN ($enList))) / len(t)) * 5.0, 1.0) AS quality
         |FROM toks JOIN documents USING (doc_id)""".stripMargin,

    "text_langid" ->
      s"""$toksCte
         |SELECT doc_id,
         |  len(list_filter(t, x -> x IN ($enList))) AS score_en,
         |  len(list_filter(t, x -> x IN ($esList))) AS score_es,
         |  len(list_filter(t, x -> x IN ($frList))) AS score_fr,
         |  CASE WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
         |       WHEN score_es >= score_fr THEN 'es' ELSE 'fr' END AS lang_pred
         |FROM toks""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm_text,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,

    "dedup_exact" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint
        |  FROM documents
        |)
        |SELECT doc_id, fingerprint,
        |       min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
        |       CAST(doc_id <> min(doc_id) OVER (PARTITION BY fingerprint) AS INT) AS is_dup
        |FROM fp""".stripMargin,

    // incremental first-wins over ordered batches == one global window
    "dedup_streaming_index" ->
      """SELECT doc_id,
        |       CAST(doc_id <> min(doc_id) OVER w AS INT) AS is_dup,
        |       CASE WHEN doc_id <> min(doc_id) OVER w
        |            THEN min(doc_id) OVER w END AS dup_of
        |FROM documents
        |WINDOW w AS (PARTITION BY md5(text))""".stripMargin,

    // after expiring the first two batches' claims, the index holds
    // exactly the fps first seen in batches 2-3 (batch b = doc_id / span,
    // span = max/4+1 — same split as the Spark side), each mapped to its
    // first claimant; expired fps drop out entirely
    "dedup_streaming_ttl" ->
      """WITH spanv AS (SELECT max(doc_id) // 4 + 1 AS s FROM documents),
        |fp AS (SELECT doc_id, md5(text) AS f,
        |              doc_id // (SELECT s FROM spanv) AS b FROM documents),
        |claims AS (
        |  SELECT f, min(doc_id) AS first_doc FROM fp
        |  WHERE b >= 2 AND f NOT IN (SELECT DISTINCT f FROM fp WHERE b < 2)
        |  GROUP BY f)
        |SELECT fp.doc_id,
        |       CAST(fp.doc_id <> c.first_doc AS INT) AS is_dup,
        |       CASE WHEN fp.doc_id <> c.first_doc THEN c.first_doc END AS dup_of
        |FROM fp JOIN claims c ON fp.f = c.f""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""$shinglesCte, sig AS (
         |  SELECT doc_id, $minhashMins FROM sh GROUP BY doc_id
         |), bands0 AS (
         |  $bandSelects
         |)${bandCapCtes(MinHashMaxBandDf)}
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id""".stripMargin,

    // the incrementally built band index's verdicts == the global
    // band-min window: a doc is a candidate iff any of its bands was
    // first claimed by an earlier doc (shingle-less docs carry zeros)
    "dedup_streaming_bands" ->
      s"""$shinglesCte, sig AS (
         |  SELECT doc_id, $minhashMins FROM sh GROUP BY doc_id
         |), bands0 AS (
         |  $bandSelects
         |), m AS (
         |  SELECT band, key, min(doc_id) AS fd FROM bands0 GROUP BY 1, 2
         |), v AS (
         |  SELECT b.doc_id,
         |         CAST(sum(CASE WHEN m.fd < b.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_bands,
         |         CAST(max(CASE WHEN m.fd < b.doc_id THEN 1 ELSE 0 END) AS INT) AS is_candidate_dup
         |  FROM bands0 b JOIN m USING (band, key) GROUP BY 1
         |)
         |SELECT d.doc_id,
         |       coalesce(v.n_hit_bands, 0) AS n_hit_bands,
         |       coalesce(v.is_candidate_dup, 0) AS is_candidate_dup
         |FROM documents d LEFT JOIN v USING (doc_id)""".stripMargin,

    "dedup_simhash" ->
      s"""$toksCte, tk AS (
         |  SELECT doc_id, md5(unnest(t)) AS h FROM toks
         |), c AS (
         |  SELECT doc_id,
         |         $simhashCols
         |  FROM tk GROUP BY doc_id
         |), sig AS (
         |  SELECT doc_id, $simhashBits AS simhash FROM c
         |)
         |SELECT doc_id, simhash,
         |       substr(simhash, 1, 8) AS band0, substr(simhash, 9, 8) AS band1,
         |       substr(simhash, 17, 8) AS band2, substr(simhash, 25, 8) AS band3
         |FROM sig""".stripMargin,

    "dedup_simhash_pairs" -> simHashPairsSql(SimHashMaxBandDf),

    "dedup_simhash_pairs_capped" -> simHashPairsSql(SimHashBiteCap),

    "dedup_minhash_verified" ->
      s"""$shinglesCte$verifiedCtes
         |SELECT doc_a, doc_b, jaccard FROM verified""".stripMargin,

    "dedup_spans" ->
      s"""$toksCte, g AS (
         |  SELECT doc_id,
         |         unnest(list_distinct([array_to_string(t[j:j+${SpanN - 1}], ' ')
         |                               for j in range(1, len(t) - ${SpanN - 2})])) AS g
         |  FROM toks WHERE len(t) >= $SpanN
         |), d AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY g) AS df FROM g
         |), agg AS (
         |  SELECT doc_id, count(*) AS n_spans,
         |         CAST(sum(CASE WHEN df >= $SpanMinDf THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
         |  FROM d GROUP BY doc_id
         |)
         |SELECT doc.doc_id,
         |       coalesce(n_spans, 0) AS n_spans,
         |       coalesce(n_dup_spans, 0) AS n_dup_spans,
         |       CASE WHEN coalesce(n_spans, 0) > 0
         |            THEN coalesce(n_dup_spans, 0) / n_spans ELSE 0.0 END AS dup_span_frac
         |FROM documents doc LEFT JOIN agg USING (doc_id)""".stripMargin,

    "dedup_incremental" ->
      s"""$shinglesCte, sig AS (
         |  SELECT doc_id, $minhashMins FROM sh GROUP BY doc_id
         |), bands0 AS (
         |  $bandSelects
         |), hist0 AS (
         |  SELECT * FROM bands0
         |  WHERE substr(md5('inc:' || doc_id::VARCHAR), 1, 1) < '$IncSplitHex'
         |), hkeep AS (
         |  SELECT band, key FROM hist0 GROUP BY band, key HAVING count(*) <= $MinHashMaxBandDf
         |), hist AS (
         |  SELECT hist0.* FROM hist0 JOIN hkeep USING (band, key)
         |), bcand AS (
         |  SELECT * FROM bands0
         |  WHERE substr(md5('inc:' || doc_id::VARCHAR), 1, 1) >= '$IncSplitHex'
         |), hits AS (
         |  SELECT DISTINCT b.doc_id, b.band
         |  FROM bcand b JOIN hist h ON b.band = h.band AND b.key = h.key
         |), agg AS (
         |  SELECT doc_id, count(*) AS n_hit_bands FROM hits GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |       coalesce(n_hit_bands, 0) AS n_hit_bands,
         |       CAST(coalesce(n_hit_bands, 0) > 0 AS INT) AS is_near_dup
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |WHERE substr(md5('inc:' || d.doc_id::VARCHAR), 1, 1) >= '$IncSplitHex'""".stripMargin,

    "dedup_clusters" ->
      s"""${shinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ")}$verifiedCtes, edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM verified
         |  UNION SELECT doc_b, doc_a FROM verified
         |), reach AS (
         |  SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |)
         |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |FROM reach GROUP BY a""".stripMargin,

    "pipeline_leakage_split" ->
      s"""${shinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ")}$verifiedCtes, edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM verified
         |  UNION SELECT doc_b, doc_a FROM verified
         |), reach AS (
         |  SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |), clus AS (
         |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |  FROM reach GROUP BY a
         |)
         |SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep,
         |  CASE WHEN substr(md5(CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 1)
         |            IN ('c','d') THEN 'val'
         |       WHEN substr(md5(CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 1)
         |            IN ('e','f') THEN 'test'
         |       ELSE 'train' END AS split
         |FROM documents d LEFT JOIN clus c USING (doc_id)""".stripMargin,

    "dedup_ngram_jaccard" -> ngramJaccardSql,

    // brute comparator for dedup_prefix_jaccard: same threshold, same
    // oracle — the two queries differ only in physical strategy
    "dedup_ngram_jaccard_t07" -> ngramJaccardSqlAt("0.7"),

    // same brute inverted-index oracle SHAPE on purpose: the prefix-
    // filtered join must reproduce the brute join's exact result at its
    // threshold — completeness of the PPJoin candidate rule is the claim
    // under test. 0.7 because that's where prefix filtering operates in
    // practice (CCNet/Gopher-style near-dup): prefixes are ~30% of each
    // doc; at the suite's 0.2 they'd be ~80% and filter nothing.
    "dedup_prefix_jaccard" -> ngramJaccardSqlAt("0.7"),

    "dedup_minhash_est" ->
      s"""$shinglesCte$verifiedCtes
         |SELECT v.doc_a, v.doc_b, v.jaccard,
         |       (${(0 until Dedup.MinHashK)
                    .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
                    .mkString(" + ")}) / ${Dedup.MinHashK}.0 AS est_jaccard
         |FROM verified v
         |JOIN sig a ON a.doc_id = v.doc_a
         |JOIN sig b ON b.doc_id = v.doc_b""".stripMargin,

    "dedup_containment" ->
      s"""$shinglesCte, sizes AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, shared, na.n AS n_a, nb.n AS n_b,
         |       shared / least(na.n, nb.n) AS containment
         |FROM pairs
         |JOIN sizes na ON na.doc_id = doc_a
         |JOIN sizes nb ON nb.doc_id = doc_b
         |WHERE shared / least(na.n, nb.n) >= ${ContainmentThreshold}""".stripMargin,

    "ann_cosine_topk" ->
      s"""$embCte
         |SELECT q.vec_id AS query_id, c.vec_id,
         |       row_number() OVER (PARTITION BY q.vec_id
         |                          ORDER BY ${cosSql("q.v", "c.v")} DESC, c.vec_id ASC) AS rank,
         |       ${cosSql("q.v", "c.v")} AS cos
         |FROM e q JOIN e c ON c.vec_id <> q.vec_id
         |WHERE q.vec_id % 100 = 0
         |QUALIFY rank <= ${TopK}""".stripMargin,

    "ann_ivf_topk" ->
      s"""$embCte$ivfCtes
         |SELECT query_id, a.vec_id,
         |       row_number() OVER (PARTITION BY query_id
         |                          ORDER BY ${cosSql("qv", "a.v")} DESC, a.vec_id ASC) AS rank,
         |       ${cosSql("qv", "a.v")} AS cos
         |FROM probes p JOIN assign a USING (centroid_id)
         |WHERE a.vec_id <> p.query_id
         |QUALIFY rank <= ${TopK}""".stripMargin,

    "ann_rhp_topk" ->
      s"""$embCte$rhpCtes, cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
         |  FROM bands0 q JOIN bands0 c
         |    ON q.band = c.band AND q.key = c.key AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id % 100 = 0
         |)
         |SELECT query_id, cand.vec_id,
         |       row_number() OVER (PARTITION BY query_id
         |                          ORDER BY ${cosSql("qe.v", "ce.v")} DESC, cand.vec_id ASC) AS rank,
         |       ${cosSql("qe.v", "ce.v")} AS cos
         |FROM cand
         |JOIN e qe ON qe.vec_id = cand.query_id
         |JOIN e ce ON ce.vec_id = cand.vec_id
         |QUALIFY rank <= ${TopK}""".stripMargin,

    "pipeline_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
        |       ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    "graph_pagerank" -> prOracle,

    // canonical-order triangle count over the same undirected graph: the
    // count is independent of the engine's orientation strategy, so a
    // plain (a < b) wedge join is a complete oracle for it
    "graph_triangles" ->
      (linkCtes(TriLinks) +
        """,
          |und AS (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM e WHERE src <> dst
          |),
          |deg AS (
          |  SELECT v, count(*) AS deg
          |  FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
          |  GROUP BY 1
          |),
          |tri AS (
          |  SELECT count(*) AS n FROM und e1
          |  JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
          |  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
          |)
          |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
          |       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
          |       (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
          |       CAST(n AS BIGINT) AS n_triangles
          |FROM tri""".stripMargin),

    "pipeline_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % ${PackShards} AS shard,
         |         CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents
         |)
         |SELECT doc_id, shard, n_tokens,
         |       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |                     ROWS UNBOUNDED PRECEDING) - n_tokens) / ${PackBudget})
         |            AS BIGINT) AS bin_id
         |FROM t""".stripMargin,

    "pipeline_pack_concat" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, doc_id % ${PackShards} AS shard,
         |         CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), p AS (
         |  SELECT doc_id, text, shard, n_tokens,
         |         CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |                       ROWS UNBOUNDED PRECEDING) - n_tokens) / ${PackBudget})
         |              AS BIGINT) AS bin_id
         |  FROM t
         |)
         |SELECT shard, bin_id, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
         |       string_agg(text, '<eos>' ORDER BY doc_id) AS packed_text
         |FROM p GROUP BY 1, 2""".stripMargin,

    "text_tfidf_topk" ->
      s"""$toksCte, tt AS (
         |  SELECT doc_id, unnest(t) AS term FROM toks
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM tt WHERE term <> '' GROUP BY 1, 2
         |), df AS (
         |  SELECT term, count(*) AS df FROM tf GROUP BY 1
         |), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT doc_id, term, tf, round(tf * ln(n_docs / df), 6) AS score,
         |       row_number() OVER (PARTITION BY doc_id
         |                          ORDER BY round(tf * ln(n_docs / df), 6) DESC, term ASC) AS rank
         |FROM tf JOIN df USING (term) CROSS JOIN n
         |QUALIFY rank <= ${TfidfK}""".stripMargin,

    "emb_near_dup" ->
      s"""$embCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${cosSql("a.v", "b.v")} AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v")} >= ${NearDupThreshold}""".stripMargin,

    "emb_near_dup_lsh" ->
      s"""$embCte$rhpCtes$rhpPairCtes
         |SELECT vec_a, vec_b, cos FROM epairs""".stripMargin,

    "emb_dedup_clusters" ->
      s"""${embCte.replaceFirst("WITH ", "WITH RECURSIVE ")}$rhpCtes$rhpPairCtes, edges AS (
         |  SELECT vec_a AS a, vec_b AS b FROM epairs
         |  UNION SELECT vec_b, vec_a FROM epairs
         |), reach AS (
         |  SELECT a, b FROM edges
         |  UNION SELECT r.a, g.b FROM reach r JOIN edges g ON r.b = g.a
         |)
         |SELECT a AS vec_id, least(a, min(b)) AS cluster_id
         |FROM reach GROUP BY a""".stripMargin,

    "ann_ivf_recall" ->
      s"""$embCte$ivfCtes$bfCte, ivf AS (
         |  SELECT query_id, a.vec_id, 1 AS hit,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY ${cosSql("qv", "a.v")} DESC, a.vec_id ASC) AS rank
         |  FROM probes p JOIN assign a USING (centroid_id)
         |  WHERE a.vec_id <> p.query_id
         |  QUALIFY rank <= ${TopK}
         |)
         |${recallSql("ivf")}""".stripMargin,

    "emb_normalize_quantize" ->
      s"""$embCte, unit AS (
         |  SELECT vec_id,
         |    CASE WHEN sqrt(${dotSql("v", "v")}) = 0.0 THEN [0.0 FOR x IN v]
         |         ELSE [x / sqrt(${dotSql("v", "v")}) FOR x IN v] END AS u
         |  FROM e
         |), ex AS (
         |  SELECT vec_id, u, unnest(range(len(u))) AS idx FROM unit
         |)
         |SELECT vec_id, idx, u[idx + 1] AS unit_val,
         |       CAST(floor(u[idx + 1] * 127.0 + 0.5) AS BIGINT) AS q8_val
         |FROM ex""".stripMargin,

    "mm_decode_meta" ->
      """SELECT doc_id AS asset_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |       octet_length(encode(text)) AS byte_len,
        |       CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
        |       CAST(64 + (octet_length(encode(text)) * 31) % 353 AS INT) AS height,
        |       CAST(1 + octet_length(encode(text)) % 24 AS INT) AS n_frames,
        |       md5(text) AS checksum
        |FROM documents""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id AS asset_id,
        |       unnest(range(0, octet_length(encode(text)), 256)) AS frame_offset
        |FROM documents""".stripMargin,

    "mm_feature_extract" ->
      """WITH h AS (
        |  SELECT doc_id AS asset_id, md5(text) AS hx FROM documents
        |), d AS (
        |  SELECT asset_id, hx, unnest(range(8)) AS dim FROM h
        |)
        |SELECT asset_id, dim,
        |       (CAST('0x' || substr(hx, CAST(dim * 4 + 1 AS INT), 4) AS INT)
        |        / 65535.0 - 0.5) * 2.0 AS fval
        |FROM d""".stripMargin,

    "mm_resize_plan" ->
      """WITH m AS (
        |  SELECT doc_id AS asset_id,
        |         CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
        |         CAST(64 + (octet_length(encode(text)) * 31) % 353 AS INT) AS height
        |  FROM documents
        |)
        |SELECT asset_id, width, height,
        |       greatest(1, CAST(floor(width * least(256 / width, 256 / height)) AS BIGINT)) AS out_w,
        |       greatest(1, CAST(floor(height * least(256 / width, 256 / height)) AS BIGINT)) AS out_h,
        |       least(256 / width, 256 / height) AS scale
        |FROM m""".stripMargin,

    "text_ngram_topk" ->
      s"""$shinglesCte
         |SELECT s AS ngram, count(*) AS n FROM sh
         |GROUP BY s ORDER BY n DESC, ngram ASC LIMIT 50""".stripMargin,

    "text_bm25_search" ->
      s"""$toksCte, tf AS (
         |  SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
         |    CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE) AS tf0,
         |    CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE) AS tf1,
         |    CAST(len(list_filter(t, x -> x = 'table')) AS DOUBLE) AS tf2
         |  FROM toks
         |), stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |         sum(dl) / count(*) AS avgdl,
         |         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
         |         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
         |         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
         |  FROM tf
         |), scored AS (
         |  SELECT doc_id, round(
         |      ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
         |    + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
         |    + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
         |  FROM tf CROSS JOIN stats
         |)
         |SELECT doc_id, score FROM scored WHERE score > 0.0""".stripMargin,

    "pipeline_quality_filter" ->
      s"""$toksCte, scored AS (
         |  SELECT doc_id,
         |    0.3 * least(len(t) / 100.0, 1.0)
         |      + 0.3 * (1.0 - (len(text) - len(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'))) / len(text))
         |      + 0.4 * least((len(list_filter(t, x -> x IN ($enList))) / len(t)) * 5.0, 1.0) AS quality,
         |    len(list_filter(t, x -> x IN ($enList))) AS s_en,
         |    len(list_filter(t, x -> x IN ($esList))) AS s_es,
         |    len(list_filter(t, x -> x IN ($frList))) AS s_fr
         |  FROM toks JOIN documents USING (doc_id)
         |), lp AS (
         |  SELECT doc_id, quality,
         |    CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |         WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred
         |  FROM scored
         |), dup AS (
         |  SELECT doc_id,
         |    CAST(doc_id <> min(doc_id) OVER (PARTITION BY
         |      md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')))) AS INT) AS is_dup
         |  FROM documents
         |)
         |SELECT doc_id, quality, lang_pred
         |FROM lp JOIN dup USING (doc_id)
         |WHERE quality >= 0.5 AND lang_pred = 'en' AND is_dup = 0""".stripMargin)
}
