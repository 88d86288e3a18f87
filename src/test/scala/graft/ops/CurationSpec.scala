package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("upsampleByWeight: integer part repeats, fraction keeps a hash subset") {
    val df = (0L until 200L).map(i => (i, if (i < 100) "a" else "b"))
      .toDF("doc_id", "source")
    val out = Curation.upsampleByWeight(df, col("source"),
      Map("a" -> 2.5, "b" -> 1.0))
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n"),
        min(col("epoch")).as("lo"), max(col("epoch")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val aCounts = out.filter(_._2 == "a").map(_._3)
    assert(aCounts.forall(n => n == 2 || n == 3))
    // ~half of "a" docs get the extra epoch — deterministic hash, wide net
    val extras = aCounts.count(_ == 3)
    assert(extras > 20 && extras < 80, s"extras=$extras")
    assert(out.filter(_._2 == "b").forall(_._3 == 1))
    // epochs are a dense 0..n-1 range
    assert(out.forall { case (_, _, n, lo, hi) => lo == 0 && hi == n - 1 })
    // an absent domain emits nothing
    assert(Curation.upsampleByWeight(df, col("source"), Map("a" -> 1.0))
      .filter(col("source") === "b").count() == 0)
  }

  test("piiRedact: counts and ordered redaction") {
    val df = Seq(
      (0L, "mail bob.smith+x@corp.example.org then call 555-123-4567 from 10.2.0.9 end"),
      (1L, "no pii in this text at all"),
      (2L, "two mails a@b.co and c.d@e.f.org one ip 192.168.1.255")
    ).toDF("doc_id", "text")
    val out = Curation.piiRedact(df, col("text"))
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(1) == 1 && out(0L).getLong(2) == 1 && out(0L).getLong(3) == 1)
    assert(out(0L).getString(4) ==
      "mail <EMAIL> then call <PHONE> from <IP> end")
    assert(out(1L).getLong(1) == 0 && out(1L).getString(4) == "no pii in this text at all")
    assert(out(2L).getLong(1) == 2 && out(2L).getLong(3) == 1)
    // email pass runs first, so its dotted domain never half-matches as an IP
    assert(out(2L).getString(4) == "two mails <EMAIL> and <EMAIL> one ip <IP>")
  }

  test("piiRedact: counts always equal placeholders when patterns overlap") {
    // the email local part swallows the phone-shaped token; counts are
    // measured per pass, so n_phones must be 0, matching the redacted copy
    val df = Seq((0L, "reach 555-123-4567@x.co now")).toDF("doc_id", "text")
    val r = Curation.piiRedact(df, col("text"))
      .select("n_emails", "n_phones", "n_ips", "redacted").head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 0 && r.getLong(2) == 0)
    assert(r.getString(3) == "reach <EMAIL> now")
  }

  test("urlDomainCap: malformed URLs are quarantined, not pooled into one window") {
    val docs = Seq((0L, "https://ok.example.com/p/0"), (1L, "notaurl"),
      (2L, "also not a url")).toDF("doc_id", "url")
    val out = Curation.urlDomainCap(docs, col("url"),
      Seq.empty[String].toDF("domain"), 5).select("doc_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L))
  }

  test("urlDomainCap: blocklist drops, per-domain cap bites deterministically") {
    val docs = (0L until 20L).map(i =>
      (i, s"https://site${i % 2}.example.com/p/$i")).toDF("doc_id", "url")
    val blocked = Seq("site1.example.com").toDF("domain")
    val out = Curation.urlDomainCap(docs, col("url"), blocked, 3)
      .select("doc_id", "domain", "rank").collect()
    assert(out.forall(_.getString(1) == "site0.example.com"))
    assert(out.length == 3 && out.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L))
    // determinism: same input, same survivors
    val again = Curation.urlDomainCap(docs, col("url"), blocked, 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
  }

  private val corpus = Seq(
    // doc 0 is "eval" (id % 2 == 0 in these tests); doc 1 copies a 4-gram
    (0L, "alpha beta gamma delta epsilon zeta"),
    (1L, "one two alpha beta gamma delta three"),
    (2L, "totally different words here now okay"),
    (3L, "spam spam spam spam spam ham eggs"),
    (4L, "all tokens unique in this doc")
  ).toDF("doc_id", "text")

  test("globalQuantiles: value at rank ceil(p*n), ties collapse correctly") {
    import spark.implicits._
    // 10 values with heavy ties: sorted = [1,1,1,2,2,3,3,3,3,9]
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L, 3L, 3L, 3L, 9L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "v")
    val out = Curation.globalQuantiles(df, "v", Seq(0.25, 0.5, 0.75, 1.0))
      .collect()(0)
    // ranks: ceil(.25*10)=3 -> 1, ceil(.5*10)=5 -> 2, ceil(.75*10)=8 -> 3,
    // ceil(1*10)=10 -> 9
    assert(out.getLong(0) == 1L && out.getLong(1) == 2L)
    assert(out.getLong(2) == 3L && out.getLong(3) == 9L)
    // matches the rank-window formulation (single stratum) exactly
    val viaRank = Curation.quantilesByStratum(df.withColumn("_s", lit(1)),
      "_s", "v", "doc_id", Seq(0.25, 0.5, 0.75, 1.0)).collect()(0)
    assert((0 to 3).forall(i => out.getLong(i) == viaRank.getLong(i + 2)))
  }

  test("outlierFilter: median/MAD gate flags the far point, not the tail of a skew") {
    import spark.implicits._
    // stratum A: tight cluster around 100 with one far point; the mean
    // would be dragged to ~190, a mean/stddev gate might keep 1000 in —
    // the median (100) and MAD (2) cannot be moved by the single outlier
    val a = Seq(98L, 99L, 100L, 101L, 102L, 103L, 104L, 105L, 106L, 1000L)
      .zipWithIndex.map { case (v, i) => (i.toLong, "A", v) }
    val b = Seq(10L, 20L, 30L).zipWithIndex.map { case (v, i) => (100L + i, "B", v) }
    val df = (a ++ b).toDF("doc_id", "source", "n_chars")
    val out = Curation.outlierFilter(df, "source", "n_chars", "doc_id", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("med"), r.getAs[Long]("mad"), r.getAs[Int]("is_outlier")))).toMap
    // A: n=10 -> median = 5th of sorted = 102; MAD = 5th of sorted |x-102|
    assert(out(0L)._1 == 102L && out(0L)._2 == 2L)
    assert(out(9L)._3 == 1)                        // the 1000 is flagged
    assert((0L to 8L).forall(out(_)._3 == 0))      // the cluster is not
    // B is its own stratum: median 20, MAD 10, nothing flagged
    assert(out(100L) == ((20L, 10L, 0)))
    assert(out(101L)._3 == 0 && out(102L)._3 == 0)
  }

  test("wordNgrams: distinct n-grams, empty under n tokens") {
    val df = corpus.select(col("doc_id"), Curation.wordNgrams(col("text"), 4).as("g"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(0L).contains("alpha beta gamma delta"))
    assert(m(3L).contains("spam spam spam spam"))
    // repeated 4-gram appears once (distinct)
    assert(m(3L).count(_ == "spam spam spam spam") == 1)
    val short = Seq((9L, "one two three")).toDF("doc_id", "text")
      .select(Curation.wordNgrams(col("text"), 4).as("g")).head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("decontaminate flags exactly the overlapping non-eval doc") {
    val out = Curation.decontaminate(corpus, pmod(col("doc_id"), lit(2)) === 0, n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out.keySet == Set(1L, 3L)) // only non-eval docs, all of them
    assert(out(1L) == (1L, 1)) // shares "alpha beta gamma delta" with doc 0
    assert(out(3L) == (0L, 0))
  }

  test("repetitionStats: fractions and flag") {
    val out = Curation.repetitionStats(corpus, topBigramMax = 0.5, dupTrigramMax = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getInt(3))).toMap
    // doc 3: bigrams = [spam spam]x4, [spam ham], [ham eggs] -> top 4/6
    assert(math.abs(out(3L)._1 - 4.0 / 6.0) < 1e-15)
    // trigrams: [spam spam spam]x3 [spam spam ham] [spam ham eggs] -> dup 2/5
    assert(math.abs(out(3L)._2 - 2.0 / 5.0) < 1e-15)
    assert(out(3L)._3 == 1)
    assert(out(4L)._1 == 1.0 / 5.0 && out(4L)._2 == 0.0 && out(4L)._3 == 0)
  }

  test("stratifiedSample: threshold math, opt-in strata, determinism") {
    assert(Curation.hexThreshold(0.5) == "8000")
    assert(Curation.hexThreshold(0.25) == "4000")
    // 1.0 must NOT be "10000": 5 chars breaks the fixed-width compare
    // ("abcd" < "10000" is false), silently keeping only ~6% of rows
    assert(Curation.hexThreshold(1.0) == "g")    // sorts after every hex key
    assert(Curation.hexThreshold(0.0) == "0000") // keeps none
    val df = (0L until 2000L).toDF("doc_id")
      .withColumn("stratum", when(col("doc_id") % 2 === 0, "a").otherwise("b"))
    val kept = Curation.stratifiedSample(df, col("stratum"), Map("a" -> 0.5))
    val counts = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("b"))                   // absent stratum keeps nothing
    assert(counts("a") > 350 && counts("a") < 650)  // ~0.5 of 1000
    // deterministic: same rows on re-run
    val again = Curation.stratifiedSample(df, col("stratum"), Map("a" -> 0.5))
    assert(kept.collect().map(_.getLong(0)).sorted
      .sameElements(again.collect().map(_.getLong(0)).sorted))
  }

  test("stratifiedSample: fraction 1.0 keeps the whole stratum") {
    val df = (0L until 500L).toDF("doc_id").withColumn("stratum", lit("a"))
    assert(Curation.stratifiedSample(df, col("stratum"), Map("a" -> 1.0)).count() == 500L)
  }

  test("domainMix: exact quotas, deterministic membership") {
    val df = (0L until 300L).toDF("doc_id")
      .withColumn("domain", when(col("doc_id") < 200, "big").otherwise("small"))
    // budget 0.5 * 300 = 150; weights big=3, small=1 -> quotas 112, 37
    val out = Curation.domainMix(df, col("domain"), Map("big" -> 3.0, "small" -> 1.0), 0.5)
    val counts = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") == math.floor(0.5 * 300 * 3.0 / 4.0).toLong)
    assert(counts("small") == math.floor(0.5 * 300 * 1.0 / 4.0).toLong)
    // rank column: contiguous 1..quota within each domain
    val ranks = out.filter(col("domain") === "small").select("rank")
      .collect().map(_.getLong(0)).sorted
    assert(ranks.sameElements(1L to counts("small")))
    // a domain with no weight contributes nothing
    val none = Curation.domainMix(df, col("domain"), Map("big" -> 1.0), 0.5)
    assert(none.filter(col("domain") === "small").count() == 0)
  }

  test("quantilesByStratum: rank-selection values") {
    val df = Seq.tabulate(100)(i => (i.toLong, "x", (i + 1).toLong))
      .toDF("id", "s", "v")
    val out = Curation.quantilesByStratum(df, "s", "v", "id", Seq(0.5, 0.9, 0.99))
      .head
    assert(out.getAs[Long]("n_rows") == 100L)
    assert(out.getAs[Long]("p50_v") == 50L)  // ceil(0.5*100) = 50th smallest
    assert(out.getAs[Long]("p90_v") == 90L)
    assert(out.getAs[Long]("p99_v") == 99L)
  }
}
