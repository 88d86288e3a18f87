package graft.queries

import graft.ops.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators ([[graft.ops.Curation]]) as driver-contract
  * queries + DuckDB oracles over `documents`.
  *
  * Oracle discipline (same as [[OpsQueries]]): every float expression tree
  * is written once and mirrored verbatim; sampling thresholds and quota
  * arithmetic are computed from the SAME Scala constants that parameterize
  * the Column code, so the two engines compare byte-identical constants.
  */
object CurationQueries {

  import QueryUtil.scanParallel

  private def docs(s: SparkSession, dir: String) =
    scanParallel(s.read.parquet(s"$dir/documents.parquet"), s)

  /** Decontamination gram size (word n-grams). Real pipelines use 8-13;
    * the synthetic corpus' ~30-word vocabulary makes 4 the size where
    * near-dup docs overlap but unrelated docs mostly don't.
    */
  val DecontamN = 4
  /** Eval split: every 20th doc stands in for the benchmark set. */
  val EvalMod = 20

  val TopBigramMax = 0.10
  val DupTrigramMax = 0.02

  /** Per-lang sample fractions; zh deliberately absent (absent strata keep
    * nothing — the explicit-opt-in contract of
    * [[Curation.stratifiedSample]]).
    */
  val SampleFractions: Seq[(String, Double)] =
    Seq("en" -> 0.5, "es" -> 0.25, "fr" -> 0.25, "de" -> 0.125)

  /** Domain-mix targets: first ten sources weighted 2, the rest 1 — exact
    * doubles so the quota arithmetic is order-insensitive across engines.
    */
  val MixWeights: Seq[(String, Double)] =
    (0 until 20).map(i => s"src$i" -> (if (i < 10) 2.0 else 1.0))
  val MixBudgetFrac = 0.4
  val MixSumW: Double = MixWeights.map(_._2).sum

  val QuantilePs = Seq(0.5, 0.9, 0.99)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_decontaminate" -> ((s, dir) =>
      Curation.decontaminate(docs(s, dir),
        pmod(col("doc_id"), lit(EvalMod)) === 0, DecontamN)),

    "text_repetition" -> ((s, dir) =>
      Curation.repetitionStats(docs(s, dir), TopBigramMax, DupTrigramMax)),

    "pipeline_stratified_sample" -> ((s, dir) =>
      Curation.stratifiedSample(docs(s, dir), col("lang"), SampleFractions.toMap)
        .select("doc_id", "lang", "source")),

    "pipeline_domain_mix" -> ((s, dir) =>
      Curation.domainMix(docs(s, dir), col("source"), MixWeights.toMap, MixBudgetFrac)
        .select("doc_id", "source", "rank")),

    "text_length_quantiles" -> ((s, dir) =>
      Curation.quantilesByStratum(docs(s, dir), "lang", "n_chars", "doc_id", QuantilePs)))

  // ------------------------------------------------------------- oracles

  private val toksCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
      |)""".stripMargin

  private val sampleKeep = SampleFractions.map { case (lang, f) =>
    s"(lang = '$lang' AND substr(md5('samp:' || doc_id::VARCHAR), 1, 4) < '${Curation.hexThreshold(f)}')"
  }.mkString("\n   OR ")

  private val mixWeightRows =
    MixWeights.map { case (s, w) => s"('$s', $w)" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "text_decontaminate" ->
      s"""$toksCte, g AS (
         |  SELECT doc_id,
         |         unnest(list_distinct([array_to_string(t[j:j+${DecontamN - 1}], ' ')
         |                               for j in range(1, len(t) - ${DecontamN - 2})])) AS g
         |  FROM toks WHERE len(t) >= $DecontamN
         |), ev AS (
         |  SELECT DISTINCT g FROM g WHERE doc_id % $EvalMod = 0
         |), hits AS (
         |  SELECT doc_id, count(*) AS n_contaminated
         |  FROM g JOIN ev USING (g) WHERE doc_id % $EvalMod <> 0
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |       coalesce(h.n_contaminated, 0) AS n_contaminated,
         |       CAST(coalesce(h.n_contaminated, 0) > 0 AS INT) AS is_contaminated
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |WHERE d.doc_id % $EvalMod <> 0""".stripMargin,

    "text_repetition" ->
      s"""$toksCte, arr AS (
         |  SELECT doc_id,
         |         [array_to_string(t[j:j+1], ' ') for j in range(1, len(t))] AS b,
         |         [array_to_string(t[j:j+2], ' ') for j in range(1, len(t) - 1)] AS tri
         |  FROM toks
         |), f AS (
         |  SELECT doc_id,
         |    CASE WHEN len(b) > 0 THEN
         |      list_max(list_transform(list_distinct(b), x -> len(list_filter(b, y -> y = x)))) / len(b)
         |    ELSE 0.0 END AS top_bigram_frac,
         |    CASE WHEN len(tri) > 0 THEN 1.0 - len(list_distinct(tri)) / len(tri)
         |    ELSE 0.0 END AS dup_trigram_frac
         |  FROM arr
         |)
         |SELECT doc_id, top_bigram_frac, dup_trigram_frac,
         |       CAST(top_bigram_frac > $TopBigramMax
         |            OR dup_trigram_frac > $DupTrigramMax AS INT) AS is_repetitive
         |FROM f""".stripMargin,

    "pipeline_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE $sampleKeep""".stripMargin,

    "pipeline_domain_mix" ->
      s"""WITH w(source, wt) AS (VALUES $mixWeightRows), n AS (
         |  SELECT count(*) AS total FROM documents
         |), ranked AS (
         |  SELECT d.doc_id, d.source,
         |         row_number() OVER (PARTITION BY d.source
         |             ORDER BY md5('mix:' || d.doc_id::VARCHAR), d.doc_id) AS rank,
         |         floor($MixBudgetFrac * n.total * w.wt / $MixSumW) AS quota
         |  FROM documents d JOIN w USING (source) CROSS JOIN n
         |)
         |SELECT doc_id, source, rank FROM ranked WHERE rank <= quota""".stripMargin,

    "text_length_quantiles" ->
      s"""WITH r AS (
         |  SELECT lang, n_chars,
         |         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         |         count(*) OVER (PARTITION BY lang) AS cnt
         |  FROM documents
         |)
         |SELECT lang, max(cnt) AS n_rows,
         |       ${QuantilePs.map(p =>
                   s"max(CASE WHEN rn = ceil($p * cnt) THEN n_chars END) AS p${(p * 100).round}_n_chars")
                   .mkString(",\n       ")}
         |FROM r GROUP BY lang""".stripMargin)
}
