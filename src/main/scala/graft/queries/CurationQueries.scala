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
  /** MAD multiplier for the robust length gate (≈ 4.45 sigma if the signal
    * were normal — a deliberately loose fence; outliers should be rare).
    */
  val OutlierK = 3

  /** Per-domain survivor cap for `pipeline_url_filter`: 3 keeps the cap
    * biting at every SF (sf0.01 has ~5 docs per synthesized domain).
    */
  val MaxPerDomain = 3
  /** Blocklisted domains: the "-0" variant of every source — a fixed
    * literal list in both engines, standing in for a production blocklist
    * table.
    */
  val BlockedDomains: Seq[String] =
    (0 until 20).map(i => s"src$i-0.example.com")

  /** Deterministic PII-bearing text: the corpus has no real PII, so the
    * query plants an email on every doc, a phone on every 3rd, an IPv4 on
    * every 4th — all derived from doc_id, so the oracle rebuilds the same
    * string and both engines run the SAME detection regexes over it.
    */
  private def piiText: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(col("text"),
      lit(" contact user"), id.cast("string"), lit("@mail.example.com"),
      when(id % 3 === 0,
        concat(lit(" call 555-"), lpad((id % 1000).cast("string"), 3, "0"),
          lit("-"), lpad(((id * 7) % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(id % 4 === 0,
        concat(lit(" from 10."), (id % 256).cast("string"), lit(".0."),
          ((id * 3) % 256).cast("string")))
        .otherwise(lit("")))
  }

  /** Deterministic URL per document (sources fan out into 5 subdomains so
    * the per-domain cap has something to cap).
    */
  private val urlCol =
    concat(lit("https://"), col("source"), lit("-"),
      (col("doc_id") % 5).cast("string"), lit(".example.com/p/"),
      col("doc_id").cast("string"))

  /** Epoch weights for `pipeline_upsample`: integer, fractional, and
    * sub-one weights all exercised; sources past src14 deliberately absent
    * (absent domains emit nothing).
    */
  val UpWeights: Seq[(String, Double)] =
    (0 until 15).map(i => s"src$i" -> (if (i < 5) 2.5 else if (i < 10) 1.0 else 0.25))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_upsample" -> ((s, dir) =>
      Curation.upsampleByWeight(docs(s, dir), col("source"), UpWeights.toMap)
        .select("doc_id", "source", "epoch")),

    "text_pii_redact" -> ((s, dir) =>
      Curation.piiRedact(
        docs(s, dir).select(col("doc_id"), piiText.as("text")), col("text"))
        .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")),

    "pipeline_url_filter" -> ((s, dir) => {
      import s.implicits._
      val blocklist = BlockedDomains.toDF("domain")
      Curation.urlDomainCap(
        docs(s, dir).select(col("doc_id"), urlCol.as("url")),
        col("url"), blocklist, MaxPerDomain)
        .select("doc_id", "domain", "rank")
    }),

    "pipeline_url_dedup" -> ((s, dir) => {
      // canonical-URL dedup: synthesized URLs collide on (source, id%100)
      // once the mixed-case host is lowercased and query/fragment junk is
      // stripped; canonical id = min doc_id per canonical URL (same
      // min-over-window shape as exact text dedup)
      import org.apache.spark.sql.expressions.Window
      val url = concat(lit("https://"), col("source"), lit(".Example.com/p/"),
        (col("doc_id") % 100).cast("string"),
        lit("?utm="), col("doc_id").cast("string"), lit("#frag"))
      val w = Window.partitionBy(col("canonical"))
      docs(s, dir).select(col("doc_id"), Curation.canonicalUrl(url).as("canonical"))
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .withColumn("is_dup", (col("doc_id") =!= col("canonical_id")).cast("int"))
        .select("doc_id", "canonical", "canonical_id", "is_dup")
    }),

    "text_perplexity" -> ((s, dir) =>
      graft.ops.TextAnalysis.unigramLmScore(docs(s, dir))),

    "text_perplexity_heldout" -> ((s, dir) =>
      // CCNet shape proper: LM trained on the other 80%, every 5th doc
      // scored held-out with add-one smoothing (OOV stays finite)
      graft.ops.TextAnalysis.unigramLmHeldout(docs(s, dir),
        col("doc_id") % 5 === 0)),

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
      Curation.quantilesByStratum(docs(s, dir), "lang", "n_chars", "doc_id", QuantilePs)),

    "pipeline_outlier_filter" -> ((s, dir) =>
      // robust per-source length gate: median/MAD, all-integer arithmetic
      Curation.outlierFilter(docs(s, dir).select("doc_id", "source", "n_chars"),
          "source", "n_chars", "doc_id", OutlierK)
        .select("doc_id", "source", "n_chars", "med", "mad", "is_outlier")),

    "pipeline_curriculum" -> ((s, dir) => {
      // curriculum bucketing (short -> long): quartile thresholds come from
      // the value-histogram quantile machinery (ONE output row — the
      // corpus never flows through a rank window) and broadcast back as a
      // cross join — the scalable alternative to a global ntile window.
      // Thresholds are integers, so bucket assignment is exact.
      val d = docs(s, dir).select("doc_id", "n_chars")
      val q = Curation.globalQuantiles(d, "n_chars", Seq(0.25, 0.5, 0.75))
      d.crossJoin(broadcast(q.select("p25_n_chars", "p50_n_chars", "p75_n_chars")))
        .withColumn("bucket",
          when(col("n_chars") <= col("p25_n_chars"), 0)
            .when(col("n_chars") <= col("p50_n_chars"), 1)
            .when(col("n_chars") <= col("p75_n_chars"), 2)
            .otherwise(3))
        .select("doc_id", "n_chars", "bucket")
    }))

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

  /** Regex literals for the oracle: same pattern text as [[Curation]]'s
    * (Java regex there, RE2 here — the patterns are written to the common
    * subset), single-backslash because DuckDB standard strings don't
    * process escapes.
    */
  private val emailSql = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneSql = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val ipSql = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  // single-line ON PURPOSE: this interpolates into stripMargin'ed oracle
  // strings, where a continuation line starting with "||" would lose a pipe
  private val piiTextSql =
    "text || ' contact user' || doc_id::VARCHAR || '@mail.example.com' || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') " +
      "|| '-' || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') ELSE '' END || " +
      "CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || (doc_id % 256)::VARCHAR " +
      "|| '.0.' || ((doc_id * 3) % 256)::VARCHAR ELSE '' END"

  private val blockedInList =
    BlockedDomains.map(d => s"'$d'").mkString(", ")

  /** Per-domain epoch-count CASE, generated from the SAME Scala constants
    * as the Column code (floor + fractional hash threshold).
    */
  private val upsampleCase = {
    val whens = UpWeights.map { case (d, wt) =>
      val full = math.floor(wt).toLong
      val frac = wt - math.floor(wt)
      val expr =
        if (frac == 0.0) s"$full"
        else s"$full + CASE WHEN substr(md5('up:' || doc_id::VARCHAR), 1, 4) " +
          s"< '${Curation.hexThreshold(frac)}' THEN 1 ELSE 0 END"
      s"WHEN '$d' THEN $expr"
    }.mkString(" ")
    s"CASE source $whens ELSE 0 END"
  }

  val oracles: Map[String, String] = Map(
    "pipeline_upsample" ->
      s"""WITH n AS (
         |  SELECT doc_id, source, CAST($upsampleCase AS BIGINT) AS n_ep
         |  FROM documents
         |)
         |SELECT doc_id, source, unnest(range(0, n_ep)) AS epoch
         |FROM n WHERE n_ep > 0""".stripMargin,

    "text_pii_redact" ->
      s"""WITH p AS (
         |  SELECT doc_id, $piiTextSql AS t FROM documents
         |), r1 AS (
         |  SELECT doc_id, t, regexp_replace(t, '$emailSql', '<EMAIL>', 'g') AS t1 FROM p
         |), r2 AS (
         |  SELECT doc_id, t, t1, regexp_replace(t1, '$ipSql', '<IP>', 'g') AS t2 FROM r1
         |)
         |SELECT doc_id,
         |       len(regexp_extract_all(t, '$emailSql')) AS n_emails,
         |       len(regexp_extract_all(t2, '$phoneSql')) AS n_phones,
         |       len(regexp_extract_all(t1, '$ipSql')) AS n_ips,
         |       regexp_replace(t2, '$phoneSql', '<PHONE>', 'g') AS redacted
         |FROM r2""".stripMargin,

    "pipeline_url_filter" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |         'https://' || source || '-' || (doc_id % 5)::VARCHAR
         |           || '.example.com/p/' || doc_id::VARCHAR AS url
         |  FROM documents
         |), d AS (
         |  SELECT doc_id, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain FROM u
         |), ranked AS (
         |  SELECT doc_id, domain,
         |         row_number() OVER (PARTITION BY domain
         |             ORDER BY md5('url:' || doc_id::VARCHAR), doc_id) AS rank
         |  -- unparseable hosts quarantined (DuckDB regexp_extract yields ''
         |  -- on no-match where Spark parse_url yields NULL — both dropped)
         |  FROM d WHERE domain IS NOT NULL AND domain <> ''
         |    AND domain NOT IN ($blockedInList)
         |)
         |SELECT doc_id, domain, rank FROM ranked WHERE rank <= $MaxPerDomain""".stripMargin,

    "text_perplexity" ->
      s"""$toksCte, tf AS (
         |  SELECT doc_id, word, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS word FROM toks)
         |  GROUP BY doc_id, word
         |), vocab AS (
         |  SELECT word, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY word
         |), n AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab
         |), terms AS (
         |  SELECT doc_id, word, tf, tf * ln(c / total) AS ll
         |  FROM tf JOIN vocab USING (word) CROSS JOIN n
         |), folded AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |         round(-list_reduce(list(ll ORDER BY word), (x, y) -> x + y)
         |               / CAST(sum(tf) AS BIGINT), 6) AS avg_nll
         |  FROM terms GROUP BY doc_id
         |)
         |SELECT doc_id, n_tokens, avg_nll, round(exp(avg_nll), 4) AS ppl
         |FROM folded""".stripMargin,

    // mirror of Curation.canonicalUrl over the synthesized colliding URLs:
    // lowercase host + path, query/fragment/trailing slashes stripped;
    // host regex mirrors parse_url HOST semantics — optional userinfo
    // (up to '@') dropped, host stops at ':' so the port is dropped too
    "pipeline_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://' || source || '.Example.com/p/' || (doc_id % 100)::VARCHAR
        |           || '?utm=' || doc_id::VARCHAR || '#frag' AS url
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |         lower(regexp_extract(url, '^[a-zA-Z]+://(?:[^/?#]*@)?([^/?#:]+)', 1))
        |           || regexp_replace(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1), '/+$', '') AS canonical
        |  FROM u
        |)
        |SELECT doc_id, canonical,
        |       min(doc_id) OVER (PARTITION BY canonical) AS canonical_id,
        |       CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY canonical)
        |            THEN 1 ELSE 0 END AS is_dup
        |FROM c""".stripMargin,

    "text_perplexity_heldout" ->
      s"""$toksCte, tf AS (
         |  SELECT doc_id, doc_id % 5 = 0 AS ho, word, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS word FROM toks)
         |  GROUP BY doc_id, 2, word
         |), vocab AS (
         |  SELECT word, CAST(sum(tf) AS BIGINT) AS c FROM tf WHERE NOT ho GROUP BY word
         |), n AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS v FROM vocab
         |), terms AS (
         |  SELECT doc_id, word, tf,
         |         tf * ln((coalesce(c, 0) + 1) / (total + v)) AS ll
         |  FROM tf LEFT JOIN vocab USING (word) CROSS JOIN n
         |  WHERE ho
         |), folded AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |         round(-list_reduce(list(ll ORDER BY word), (x, y) -> x + y)
         |               / CAST(sum(tf) AS BIGINT), 6) AS avg_nll
         |  FROM terms GROUP BY doc_id
         |)
         |SELECT doc_id, n_tokens, avg_nll, round(exp(avg_nll), 4) AS ppl
         |FROM folded""".stripMargin,

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
         |FROM r GROUP BY lang""".stripMargin,

    // mirror of pipeline_curriculum: the same rank-selection thresholds
    // (value at rank ceil(p*n), ties by doc_id) and integer comparisons
    "pipeline_curriculum" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |         row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
        |         count(*) OVER () AS cnt
        |  FROM documents
        |), q AS (
        |  SELECT max(CASE WHEN rn = ceil(0.25 * cnt) THEN n_chars END) AS p25,
        |         max(CASE WHEN rn = ceil(0.5 * cnt) THEN n_chars END) AS p50,
        |         max(CASE WHEN rn = ceil(0.75 * cnt) THEN n_chars END) AS p75
        |  FROM r
        |)
        |SELECT doc_id, n_chars,
        |       CASE WHEN n_chars <= p25 THEN 0
        |            WHEN n_chars <= p50 THEN 1
        |            WHEN n_chars <= p75 THEN 2
        |            ELSE 3 END AS bucket
        |FROM documents CROSS JOIN q""".stripMargin,

    // mirror of Curation.outlierFilter: rank-selection median and MAD per
    // source (rank ceil(n/2), ties by doc_id), integer gate |x-med| > k*mad
    "pipeline_outlier_filter" ->
      s"""WITH r AS (
         |  SELECT doc_id, source, n_chars,
         |         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         |         count(*) OVER (PARTITION BY source) AS cnt
         |  FROM documents
         |), med AS (
         |  SELECT source, max(CASE WHEN rn = ceil(0.5 * cnt) THEN n_chars END) AS med
         |  FROM r GROUP BY source
         |), d AS (
         |  SELECT doc_id, source, n_chars, med, abs(n_chars - med) AS adev
         |  FROM documents JOIN med USING (source)
         |), r2 AS (
         |  SELECT doc_id, source, adev,
         |         row_number() OVER (PARTITION BY source ORDER BY adev, doc_id) AS rn2,
         |         count(*) OVER (PARTITION BY source) AS cnt2
         |  FROM d
         |), mad AS (
         |  SELECT source, max(CASE WHEN rn2 = ceil(0.5 * cnt2) THEN adev END) AS mad
         |  FROM r2 GROUP BY source
         |)
         |SELECT doc_id, source, n_chars, med, mad,
         |       CASE WHEN abs(n_chars - med) > $OutlierK * mad THEN 1 ELSE 0 END AS is_outlier
         |FROM d JOIN mad USING (source)""".stripMargin)
}
