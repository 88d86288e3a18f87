package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * benchmark decontamination, repetition filtering (Gopher-style), hash
  * stratified sampling, domain mixing to target weights, and per-stratum
  * length quantiles. Extends the dedup/quality family in [[Dedup]] /
  * [[TextAnalysis]] with the selection half of a data pipeline — which
  * documents make the training set, not just which are duplicates.
  *
  * Scale design (100 TB discipline):
  *   - decontamination joins the corpus' n-grams against the EVAL set's
  *     n-grams — the eval side is the small one by construction (benchmarks
  *     are thousands of docs, the corpus is billions), so it broadcasts and
  *     the corpus never shuffles;
  *   - repetition stats are pure per-row expressions (no shuffle at all);
  *     per-row work is O(tokens * distinct n-grams), fine for documents,
  *     and the whole operator pipelines with the parquet scan;
  *   - stratified sampling is a scan-only hash-threshold filter — zero
  *     shuffle, membership recomputable by any engine from the id alone
  *     (same property as [[Pipeline.hashSplit]]);
  *   - domain mixing needs exact per-domain counts, so it pays one window
  *     over a domain-partitioned shuffle — the minimum any exact-quota
  *     sampler can pay; the quota arithmetic itself is driver-side O(#domains).
  */
object Curation {

  /** Distinct word n-grams per document (space-joined), empty for docs
    * shorter than n tokens. [[Dedup.shingles]] is this at n = 3; the
    * multiplicity-keeping [[wordNgramsAll]] is the single definition of the
    * gram expression, so the three call sites cannot drift apart.
    */
  def wordNgrams(text: Column, n: Int): Column =
    array_distinct(wordNgramsAll(text, n))

  /** Benchmark decontamination: for every non-eval document, count how many
    * of its distinct word n-grams also appear in the eval split, and flag
    * any overlap. `isEval` selects the held-out split (a benchmark table in
    * production; a deterministic id predicate here). Overlapping documents
    * are what a pipeline drops before training so benchmark numbers stay
    * honest (the GPT-3 appendix-C / PaLM 13-gram procedure, reduced to the
    * engine-shaped core: gram extraction + semi-join + per-doc count).
    *
    * The eval gram set is broadcast — the corpus side never shuffles; the
    * only aggregation is keyed by doc_id, the scan's natural key.
    */
  def decontaminate(docs: DataFrame, isEval: Column, n: Int = 4): DataFrame = {
    val grams = docs.select(col("doc_id"), col("text"), isEval.as("_eval"))
      .select(col("doc_id"), col("_eval"), explode(wordNgrams(col("text"), n)).as("g"))
    val evalGrams = grams.filter(col("_eval")).select("g").distinct()
    val hits = grams.filter(!col("_eval"))
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    docs.filter(!isEval).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).cast("int").as("is_contaminated"))
  }

  /** Gopher-style repetition statistics, as pure per-row expressions:
    *   - top_bigram_frac: occurrences of the most frequent bigram / total
    *     bigrams (Gopher's "top 2-gram fraction", over counts);
    *   - dup_trigram_frac: 1 - distinct/total trigrams (Gopher's
    *     "duplicate 3-gram fraction");
    *   - is_repetitive: either fraction over its threshold.
    *
    * The bigram mode is computed inside the row as a sort + run-length fold
    * (the longest run of equal values in the sorted array IS the mode
    * count) — O(n log n) per document vs the naive
    * count-every-distinct-against-all O(distinct * total), a 17x wall-clock
    * win at sf0.1 — and keeps the operator scan-parallel with zero
    * exchanges, which an explode + groupBy formulation would give up.
    */
  def repetitionStats(docs: DataFrame, topBigramMax: Double = 0.10,
                      dupTrigramMax: Double = 0.02): DataFrame = {
    val bi = wordNgramsAll(col("text"), 2)
    val tri = wordNgramsAll(col("text"), 3)
    // fold state: (prev value, current run length, best run length); the ""
    // seed never matches a real bigram, so the first element opens run 1
    val modeCount = aggregate(array_sort(bi),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val topBigram = when(size(bi) > 0, modeCount / size(bi))
      .otherwise(lit(0.0))
    val dupTrigram = when(size(tri) > 0,
      lit(1.0) - size(array_distinct(tri)) / size(tri))
      .otherwise(lit(0.0))
    docs.select(col("doc_id"),
        topBigram.as("top_bigram_frac"),
        dupTrigram.as("dup_trigram_frac"))
      .withColumn("is_repetitive",
        (col("top_bigram_frac") > topBigramMax ||
          col("dup_trigram_frac") > dupTrigramMax).cast("int"))
  }

  /** Word n-grams per document WITH multiplicity (repetition analysis needs
    * the counts that [[wordNgrams]]' distinct throws away).
    */
  def wordNgramsAll(text: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    val t = TextAnalysis.tokens(text)
    // guard: sequence(1, k) descends when k < 1, so short docs get no grams
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        j => concat_ws(" ", slice(t, j, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-stratum Bernoulli sampling by hash threshold: a row is kept when
    * the first 4 hex chars of md5("samp:" + id) fall below its stratum's
    * threshold (fraction * 0x10000, as zero-padded hex — string comparison
    * IS the numeric comparison for fixed-width hex). Scan-only: no shuffle,
    * no state, membership recomputable from the id by any engine — the
    * property that lets later pipeline stages (or the oracle) re-derive the
    * sample instead of persisting it. Fraction granularity is 1/65536.
    *
    * Strata missing from `fractions` keep nothing (explicit opt-in, so a
    * new surprise stratum cannot silently flood the sample).
    */
  def stratifiedSample(df: DataFrame, stratum: Column,
                       fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val key = substring(md5(concat(lit("samp:"), col("doc_id").cast("string"))), 1, 4)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (s, f)) =>
      acc || (stratum === s && key < hexThreshold(f))
    }
    df.filter(keep)
  }

  /** fraction -> threshold string for the fixed-width-hex comparison
    * (fraction of the 16-bit key space). Shared with the oracle-SQL builder
    * so both engines compare against byte-identical constants. Fraction 1.0
    * cannot be "10000" — five chars breaks the fixed-width invariant
    * ("abcd" < "10000" is false lexicographically) — so it maps to "g",
    * which sorts after every 4-hex-digit key in both engines.
    */
  def hexThreshold(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else f"${math.floor(fraction * 65536).toLong}%04x"

  /** Domain mixing: resample the corpus to target per-domain quotas.
    * quota(d) = floor(budgetFrac * N * weight(d) / totalWeight); within a
    * domain, rows rank by (md5("mix:" + id), id) — a deterministic uniform
    * order — and the first quota(d) survive. This is how a training mix is
    * rebalanced ("20% code, 40% web, ...") when domain sizes are wildly
    * uneven.
    *
    * One count() scan (a number to the driver, like
    * [[Pipeline.adaptiveShards]]) + one window over a domain-partitioned
    * shuffle. Domains absent from `weights` get quota 0. Ties are
    * impossible: ids are distinct and the id is in the sort key.
    */
  def domainMix(df: DataFrame, domain: Column, weights: Map[String, Double],
                budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac <= 1.0, "budgetFrac must be in (0, 1]")
    require(weights.values.forall(_ >= 0.0), "weights must be non-negative")
    require(!df.columns.contains("rank"),
      "domainMix reserves the output column name 'rank'")
    val total = df.count()
    val sumW = weights.values.sum
    val quota = weights.foldLeft(lit(0L)) { case (acc, (d, w)) =>
      when(domain === d,
        lit(math.floor(budgetFrac * total * w / sumW).toLong)).otherwise(acc)
    }
    val w = Window.partitionBy(domain)
      .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))), col("doc_id"))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= quota)
  }

  /** Discrete per-stratum quantiles of a numeric column: the value at rank
    * ceil(p * n) in ascending (value, id) order — an explicit formulation
    * both engines reproduce bit-for-bit (interpolating quantiles differ in
    * float details across engines; rank selection cannot). One window + one
    * aggregation, both keyed by the stratum.
    */
  def quantilesByStratum(df: DataFrame, stratum: String, value: String,
                         idCol: String, ps: Seq[Double]): DataFrame = {
    require(!df.columns.contains("_rn") && !df.columns.contains("_cnt"),
      "quantilesByStratum reserves the column names '_rn' and '_cnt'")
    val w = Window.partitionBy(col(stratum)).orderBy(col(value), col(idCol))
    val ranked = df
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(col(stratum))))
    val aggs = max(col("_cnt")).as("n_rows") +:
      ps.map(p => max(when(col("_rn") === ceil(lit(p) * col("_cnt")), col(value)))
        .as(s"p${(p * 100).round}_$value"))
    ranked.groupBy(stratum).agg(aggs.head, aggs.tail: _*)
  }

  /** URL canonicalization for dedup: lowercase host + path with
    * query/fragment and trailing slashes stripped — the normalization that
    * collapses `https://Example.com/p/1?utm=x#top` and
    * `https://example.com/p/1/` to one crawl identity. The scheme is
    * deliberately dropped (http:// and https:// variants of one page are
    * one crawl identity), and `parse_url`'s HOST semantics strip userinfo
    * and port (`user@host:8080` -> `host`) — mirrored verbatim in the
    * oracle regex. Pure per-row expression (`try_parse_url` is a codegen'd
    * built-in; malformed URLs yield NULL and stay out of dedup groups).
    */
  def canonicalUrl(url: Column): Column = {
    val host = lower(try_parse_url(url, lit("HOST")))
    val path = regexp_replace(coalesce(try_parse_url(url, lit("PATH")), lit("")),
      "/+$", "")
    when(host.isNotNull && host =!= "", concat(host, path))
  }

  /** Exact GLOBAL quantiles of a discrete column at corpus scale: one
    * map-side-combined count shuffle keyed by the VALUE, a cumulative sum
    * over the O(#distinct values) count rows, and threshold p = the
    * smallest value whose cumulative count reaches ceil(p * n). That is
    * precisely the value at global rank ceil(p * n) in ascending order —
    * the same convention as [[quantilesByStratum]] — but the corpus never
    * flows through a rank window: a single-"stratum" call to
    * quantilesByStratum would serialize every row through ONE window
    * partition, which this formulation exists to avoid. The only
    * single-partition window here runs over the distinct-value counts
    * (document lengths, scores — thousands of values, not rows).
    */
  def globalQuantiles(df: DataFrame, value: String, ps: Seq[Double]): DataFrame = {
    val counts = df.groupBy(col(value)).agg(count(lit(1)).as("_c"))
    // single-partition by design: O(#distinct values) rows by construction
    // (EliminateWindowPartitions strips the lit(0) spec, so the window runs
    // unpartitioned — which is exactly the intended O(config) shape; the
    // session mutes WindowExecBase's advisory WARN, see Verify.session)
    val wCum = Window.partitionBy(lit(0)).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = counts
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    val aggs = ps.map(p =>
      min(when(col("_cum") >= ceil(lit(p) * col("_n")), col(value)))
        .as(s"p${(p * 100).round}_$value"))
    cum.agg(aggs.head, aggs.tail: _*)
  }

  /** One rank-selection median per stratum (the p=0.5 case of
    * [[quantilesByStratum]], reused by the MAD pipeline): value at rank
    * ceil(n/2) in ascending (value, id) order.
    */
  private def medianByStratum(df: DataFrame, stratum: String, value: String,
                              idCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(col(stratum)).orderBy(col(value), col(idCol))
    df.withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(col(stratum))))
      .groupBy(stratum)
      .agg(max(when(col("_rn") === ceil(lit(0.5) * col("_cnt")), col(value))).as(outCol))
  }

  /** Robust per-stratum outlier flagging: median/MAD gate on a numeric
    * signal — the heavy-tail-safe alternative to mean/stddev z-scores (a
    * handful of giant documents drag a mean arbitrarily; they cannot move
    * the median). Outlier rule: |x - median| > k * MAD, where MAD =
    * median(|x - median|), both medians the engine-exact rank-selection
    * form (value at rank ceil(n/2), ties ordered by id) — for an integer
    * signal the whole gate is integer arithmetic, so an external engine
    * reproduces it exactly, no float tolerance anywhere.
    *
    * Shape: two stratum-keyed window+agg passes (MAD needs the median
    * first — two passes is the minimum any exact formulation pays) and two
    * joins of O(#strata) aggregates back, which AQE broadcasts.
    */
  def outlierFilter(df: DataFrame, stratum: String, value: String,
                    idCol: String, k: Int): DataFrame = {
    val reserved = Seq("med", "mad", "is_outlier", "_adev", "_rn", "_cnt")
    require(!reserved.exists(df.columns.contains),
      s"outlierFilter reserves the column names ${reserved.mkString(", ")}")
    val med = medianByStratum(df, stratum, value, idCol, "med")
    val withMed = df.join(med, Seq(stratum))
      .withColumn("_adev", abs(col(value) - col("med")))
    val mad = medianByStratum(withMed, stratum, "_adev", idCol, "mad")
    withMed.join(mad, Seq(stratum))
      .withColumn("is_outlier", (col("_adev") > lit(k) * col("mad")).cast("int"))
      .drop("_adev")
  }

  /** PII patterns, ASCII-only by design: the same pattern text must compile
    * identically under Java regex (Spark) and RE2 (DuckDB oracle), which
    * rules out lookarounds and Unicode classes. Real pipelines extend the
    * pattern set (IBANs, SSNs, keys); the engine shape — count + ordered
    * redaction as per-row expressions — is what carries to 100 TB.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII detection + redaction: per-document counts of emails / phone
    * numbers / IPv4 addresses and a redacted copy with each replaced by a
    * typed placeholder. Replacement order is fixed (email, then IP, then
    * phone), and each count is measured on the text AS THAT PASS SEES IT —
    * so when patterns overlap (an email whose local part looks like a phone
    * number), the count always equals the number of placeholders the
    * redacted copy carries; no impossible count/placeholder mismatch. Pure
    * per-row expressions — zero shuffle, pipelines with the scan; this is
    * the shape PII scrubbing must have at corpus scale, where any keyed
    * operation would dwarf the regex cost.
    */
  def piiRedact(df: DataFrame, text: Column): DataFrame = {
    def nMatches(c: Column, re: String) =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    val redacted = regexp_replace(afterIp, PhoneRe, "<PHONE>")
    df.withColumn("n_emails", nMatches(text, EmailRe))
      .withColumn("n_phones", nMatches(afterIp, PhoneRe))
      .withColumn("n_ips", nMatches(afterEmail, Ipv4Re))
      .withColumn("redacted", redacted)
  }

  /** Epoch-weighted upsampling: repeat each document `weight(domain)` times
    * — the "2.5 epochs of Wikipedia, 0.5 of Common Crawl" mixing move. The
    * integer part repeats every doc; the fractional part keeps a
    * deterministic hash-threshold subset (same mechanism as
    * [[stratifiedSample]]) for one extra epoch, so a 2.5-weight domain
    * emits every doc twice and half its docs a third time. Domains absent
    * from `weights` emit nothing (the explicit-opt-in contract). Output
    * rows carry `epoch` (0-based) so downstream shuffling/packing can keep
    * epochs distinguishable.
    *
    * Pure per-row generation — a `sequence` explode, zero shuffle; the
    * expansion factor is the weight itself, exactly the cost any epoch
    * materialization pays (at 100 TB one usually virtualizes epochs at the
    * loader instead; when a pipeline DOES materialize, this is the shape).
    */
  def upsampleByWeight(df: DataFrame, domain: Column,
                       weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 100.0),
      "epoch weights must be in [0, 100]")
    require(!df.columns.contains("n_epochs") && !df.columns.contains("epoch"),
      "upsampleByWeight reserves the column names 'n_epochs' and 'epoch'")
    val nEpochs = weights.foldLeft(lit(0L)) { case (acc, (d, wt)) =>
      val full = math.floor(wt).toLong
      val frac = wt - math.floor(wt)
      val extra =
        if (frac == 0.0) lit(0L)
        else when(substring(md5(concat(lit("up:"), col("doc_id").cast("string"))),
          1, 4) < lit(hexThreshold(frac)), 1L).otherwise(0L)
      when(domain === d, lit(full) + extra).otherwise(acc)
    }
    df.withColumn("n_epochs", nEpochs)
      .filter(col("n_epochs") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_epochs") - 1)))
      .drop("n_epochs")
  }

  /** URL curation: extract the host from a URL column, drop blocklisted
    * domains, and cap survivors per domain at `maxPerDomain` in a
    * deterministic uniform order (md5 of the id) — the Common-Crawl-style
    * guard against any one site dominating the training mix.
    *
    * Scale shape: host extraction is per-row (`parse_url` is a codegen'd
    * built-in); the blocklist — millions of domains in production — joins
    * as a broadcast ANTI join so the corpus never shuffles for it; the only
    * shuffle is the per-domain window, keyed by the thing being capped.
    * Output keeps (doc_id, domain, rank).
    */
  def urlDomainCap(df: DataFrame, url: Column, blocklist: DataFrame,
                   maxPerDomain: Int): DataFrame = {
    require(maxPerDomain > 0, "maxPerDomain must be positive")
    require(!df.columns.contains("domain") && !df.columns.contains("rank"),
      "urlDomainCap reserves the column names 'domain' and 'rank'")
    // unparseable URLs (null/empty host) are quarantined, not capped: a
    // NULL key would slip through the anti join (NULL matches nothing) and
    // pool every malformed URL into one fake "domain" window. try_parse_url,
    // not parse_url — ANSI mode makes the latter THROW on a malformed URL.
    val withDomain = df.withColumn("domain", try_parse_url(url, lit("HOST")))
      .filter(col("domain").isNotNull && col("domain") =!= "")
    val kept = withDomain.join(broadcast(blocklist), Seq("domain"), "left_anti")
    val w = Window.partitionBy(col("domain"))
      .orderBy(md5(concat(lit("url:"), col("doc_id").cast("string"))), col("doc_id"))
    kept.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= maxPerDomain)
  }
}
