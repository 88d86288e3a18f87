package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Everything is a narrow per-row projection (no shuffle except where a
  * groupBy is the operator's semantics), built from codegen'd built-ins —
  * at 100 TB these pipeline with the parquet scan and scale linearly.
  * Float-valued scores are defined as fixed IEEE expression trees so an
  * external SQL engine (the DuckDB oracle) reproduces them bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** BPE-ish subword segmentation count: runs of letters, digits, or other
    * non-space symbols, each with an optional leading space (the GPT-2
    * pre-tokenizer shape, reduced to ASCII classes).
    */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"
  def bpeTokenCount(text: Column): Column = regexp_count(lower(text), lit(BpePattern))

  /** Small per-language stopword marker lists for the n-gram-free language-ID
    * heuristic. Deliberately tiny: language ID at scale is a lookup join or
    * model scoring; the operator shape (tokenize -> score -> argmax) is what
    * matters and is identical at any list size.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "los", "es", "un", "una"),
    "fr" -> Seq("le", "les", "des", "et", "une", "du", "est", "dans"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Language-ID scoring: stopword hits per language, argmax with a fixed
    * preference order (en > es > fr) on ties.
    */
  def langId(df: DataFrame, text: Column = col("text")): DataFrame = {
    val t = tokens(text)
    val en = countIn(t, Stopwords("en"))
    val es = countIn(t, Stopwords("es"))
    val fr = countIn(t, Stopwords("fr"))
    df.withColumn("score_en", en.cast("long"))
      .withColumn("score_es", es.cast("long"))
      .withColumn("score_fr", fr.cast("long"))
      .withColumn("lang_pred",
        when(col("score_en") >= col("score_es") && col("score_en") >= col("score_fr"), "en")
          .when(col("score_es") >= col("score_fr"), "es")
          .otherwise("fr"))
  }

  /** Token statistics: whitespace-token count, BPE-ish subword count,
    * character count.
    */
  def tokenStats(df: DataFrame, text: Column = col("text")): DataFrame =
    df.withColumn("n_tokens", size(tokens(text)).cast("long"))
      .withColumn("n_bpe", bpeTokenCount(text).cast("long"))
      .withColumn("n_chars_calc", length(text).cast("long"))

  /** Quality scoring: length/punctuation/stopword ratio features combined
    * into one [0,1] score. The expression tree is written once here and
    * mirrored verbatim in the oracle SQL — every op (int/int division,
    * multiply-add order, least) is deterministic IEEE double math.
    */
  def qualityScore(df: DataFrame, text: Column = col("text")): DataFrame = {
    val lowered = lower(text)
    val t = tokens(text)
    val nTok = size(t) // >= 1 even for empty text (split yields [""])
    val nChars = length(text)
    val nClean = length(regexp_replace(lowered, "[^a-z0-9\\s]", ""))
    // ANSI guard: empty text would divide by zero; identical to the
    // unguarded expression for any non-empty input (the oracle's domain)
    val punctRatio = when(nChars === 0, lit(0.0))
      .otherwise((nChars - nClean) / nChars)
    val stopRatio = countIn(t, Stopwords("en")) / nTok
    val score =
      lit(0.3) * least(nTok / lit(100.0), lit(1.0)) +
        lit(0.3) * (lit(1.0) - punctRatio) +
        lit(0.4) * least(stopRatio * lit(5.0), lit(1.0))
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("punct_ratio", punctRatio)
      .withColumn("stop_ratio", stopRatio)
      .withColumn("quality", score)
  }

  /** BM25 relevance of every document against a fixed term set — the
    * search-scoring half of a retrieval pipeline. Corpus statistics
    * (N, avgdl, per-term df) are two tiny aggregates broadcast back over
    * the scan; per-doc work is a narrow projection.
    *
    * Scores are rounded to 6 decimals BEFORE ranking: `ln` may differ by an
    * ulp across engines, and ranking on the rounded value keeps the oracle
    * deterministic.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    val t = tokens(col("text"))
    val withTf = terms.zipWithIndex.foldLeft(
      docs.withColumn("dl", size(t).cast("double"))) { case (df, (term, i)) =>
      df.withColumn(s"tf$i", size(filter(t, x => x === term)).cast("double"))
    }
    val statAggs = Seq(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val idf = log((col("n_docs") - col(s"df$i") + lit(0.5)) /
        (col(s"df$i") + lit(0.5)) + lit(1.0))
      idf * (col(s"tf$i") * lit(k1 + 1.0)) /
        (col(s"tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored.withColumn("score", round(score, 6))
      .filter(col("score") > 0.0)
      .select(col("doc_id"), col("score"))
  }

  /** Per-document top-k TF-IDF terms: tf = term count in doc, idf =
    * ln(n_docs / df). Two keyed aggregations (doc-term tf, term df) and one
    * per-doc top-k window — the standard keyword-extraction shape. Scores
    * round to 6 decimals BEFORE ranking (same `ln` cross-engine rule as
    * [[bm25]]).
    */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "score", "rank")
  }

  /** Unigram language-model scoring (the CCNet/CC-100 quality-filter shape
    * with the KenLM swapped for the model an engine can train in-flight):
    * fit a unigram LM on the corpus itself — p(w) = count(w) / total
    * tokens — and score every document by its average negative log
    * likelihood and perplexity. High-perplexity documents are the ones a
    * quality pipeline drops (gibberish under the corpus distribution);
    * unusually LOW perplexity flags boilerplate.
    *
    * Determinism discipline: all model statistics are integer counts
    * (exact, order-free); the per-document float work is a SEQUENTIAL fold
    * over the document's distinct terms in word order — `aggregate` over a
    * `sort_array`ed collected list here, `list_reduce` over an
    * `ORDER BY`ed list in the oracle — so the sum has one defined
    * evaluation order in both engines. nll is rounded to 6 before the
    * (engine-identical) exp, so perplexity cannot amplify a sub-round
    * residue.
    *
    * Scale shape: two keyed integer aggregations ((doc, word) tf, then the
    * vocab count — both with map-side partial agg), one join keyed by word
    * (the vocab is corpus-sized at 100 TB: a plain shuffle join, NOT a
    * broadcast), one per-doc collect_list bounded by the doc's distinct
    * term count. The 2-row totals frame broadcasts. No driver state.
    */
  def unigramLmScore(docs: DataFrame, text: Column = col("text")): DataFrame =
    unigramLmScoreWithCleanup(docs, text)._1

  def unigramLmScoreWithCleanup(docs: DataFrame, text: Column = col("text"))
      : (DataFrame, () => Unit) = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // tf feeds three consumers (the term join, the vocab agg, and — through
    // vocab — the totals agg); pinned, the corpus is tokenized and
    // (doc, word)-aggregated ONCE instead of three scans of the raw text
    val tf = docs
      .select(col("doc_id"), explode(tokens(text)).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .persist(mem)
    val vocab = tf.groupBy("word").agg(sum(col("tf")).as("c")).persist(mem)
    val totals = vocab.agg(sum(col("c")).as("total"))
    val terms = tf.join(vocab, "word").crossJoin(broadcast(totals))
      .select(col("doc_id"), col("tf"),
        struct(col("word"), (col("tf") * log(col("c") / col("total"))).as("ll"))
          .as("term"))
    val out = terms.groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sort_array(collect_list(col("term"))).as("terms"))
      .select(col("doc_id"), col("n_tokens"),
        round(-aggregate(col("terms"), lit(0.0),
          (acc, t) => acc + t.getField("ll")) / col("n_tokens"), 6).as("avg_nll"))
      .withColumn("ppl", round(exp(col("avg_nll")), 4))
    (out, () => { tf.unpersist(); vocab.unpersist(); () })
  }

  /** Held-out unigram-LM scoring — the CCNet shape proper: the LM trains
    * on the TRAIN split only and scores the HELD-OUT documents, so a
    * document can never lower its own perplexity (the leakage the
    * in-corpus [[unigramLmScore]] accepts for simplicity). Add-one
    * smoothing over the train counts keeps OOV log-probs finite:
    * p(w) = (c_w + 1) / (total + |V|). Same scale shape as the in-corpus
    * variant — the term join stays keyed by word (left join so OOV terms
    * survive), the 1-row totals frame broadcasts.
    */
  def unigramLmHeldout(docs: DataFrame, isHeldout: Column,
                       text: Column = col("text")): DataFrame =
    unigramLmHeldoutWithCleanup(docs, isHeldout, text)._1

  def unigramLmHeldoutWithCleanup(docs: DataFrame, isHeldout: Column,
                                  text: Column = col("text"))
      : (DataFrame, () => Unit) = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tf = docs
      .select(col("doc_id"), isHeldout.as("_ho"), explode(tokens(text)).as("word"))
      .groupBy("doc_id", "_ho", "word").agg(count(lit(1)).as("tf"))
      .persist(mem)
    val trainCounts = tf.filter(!col("_ho"))
      .groupBy("word").agg(sum(col("tf")).as("c")).persist(mem)
    val totals = trainCounts.agg(sum(col("c")).as("total"), count(lit(1)).as("v"))
    val terms = tf.filter(col("_ho"))
      .join(trainCounts, Seq("word"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("tf"),
        struct(col("word"),
          (col("tf") * log((coalesce(col("c"), lit(0L)) + 1) /
            (col("total") + col("v")))).as("ll")).as("term"))
    val out = terms.groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sort_array(collect_list(col("term"))).as("terms"))
      .select(col("doc_id"), col("n_tokens"),
        round(-aggregate(col("terms"), lit(0.0),
          (acc, t) => acc + t.getField("ll")) / col("n_tokens"), 6).as("avg_nll"))
      .withColumn("ppl", round(exp(col("avg_nll")), 4))
    (out, () => { tf.unpersist(); trainCounts.unpersist(); () })
  }

  /** Canonical normalized form + content fingerprint (md5 of the normalized
    * text) — the exact-dedup key and audit fingerprint.
    */
  def fingerprint(text: Column): Column =
    md5(normalized(text))

  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))
}
