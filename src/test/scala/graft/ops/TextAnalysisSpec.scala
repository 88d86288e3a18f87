package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("unigramLmScore: hand-computed avg NLL on a 2-doc corpus") {
    // corpus: "a a b" + "b c" -> total 5 tokens; c(a)=2, c(b)=2, c(c)=1
    val out = TextAnalysis.unigramLmScore(docsOf("a a b", "b c"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 0: -(2*ln(2/5) + 1*ln(2/5)) / 3 = -ln(0.4)
    assert(out(0L).getLong(1) == 3L)
    assert(math.abs(out(0L).getDouble(2) - (-math.log(0.4))) < 1e-6)
    // doc 1: -(ln(2/5) + ln(1/5)) / 2
    assert(out(1L).getLong(1) == 2L)
    val nll1 = -(math.log(0.4) + math.log(0.2)) / 2
    assert(math.abs(out(1L).getDouble(2) - nll1) < 1e-6)
    // perplexity = exp of the ROUNDED nll (the cross-engine contract)
    val expected = BigDecimal(math.exp(out(1L).getDouble(2)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L).getDouble(3) == expected)
    // gibberish under the corpus distribution scores higher than typical text
    assert(out(1L).getDouble(3) > out(0L).getDouble(3))
  }

  test("unigramLmHeldout: trains only on the train split, smooths OOV finitely") {
    // doc 2 is held out; train corpus = "a a b" + "a b" -> c(a)=3, c(b)=2,
    // total=5, |V|=2. Held-out doc "a z": p(a)=(3+1)/(5+2)=4/7,
    // p(z OOV)=(0+1)/7=1/7 — finite, no -inf
    val out = TextAnalysis.unigramLmHeldout(
        docsOf("a a b", "a b", "a z"), isHeldout = col("doc_id") === 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L)) // only held-out docs are scored
    val nll = -(math.log(4.0 / 7) + math.log(1.0 / 7)) / 2
    assert(math.abs(out(2L).getDouble(2) - nll) < 1e-6)
    // an all-OOV held-out doc scores strictly worse than an in-vocab one
    val two = TextAnalysis.unigramLmHeldout(
        docsOf("a a b", "a b", "a b", "z q"), isHeldout = col("doc_id") >= 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(two(3L) > two(2L))
  }

  test("token stats count whitespace tokens and BPE-ish pieces") {
    val out = TextAnalysis.tokenStats(docsOf("Hello world, 42 cats!"))
      .select("n_tokens", "n_bpe", "n_chars_calc").head()
    assert(out.getLong(0) == 4)
    // "hello", " world", ",", " 42", " cats", "!"
    assert(out.getLong(1) == 6)
    assert(out.getLong(2) == 21)
  }

  test("language id picks the dominant stopword language; en wins ties") {
    val out = TextAnalysis.langId(docsOf(
      "el perro de la casa es un animal",  // es markers
      "the dog of the house is an animal", // en markers
      "word salad without markers"))       // tie (0,0,0) -> en
      .select("lang_pred").as[String].collect().toSeq
    assert(out == Seq("es", "en", "en"))
  }

  test("quality score stays in [0,1] and rewards stopword-rich prose") {
    val out = TextAnalysis.qualityScore(docsOf(
      "the cat is on the mat and that is that",
      "!!! ??? ###"))
      .select("quality").as[Double].collect()
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(0) > out(1))
  }

  test("bm25: docs with more query-term hits score higher; no-hit docs drop out") {
    val out = TextAnalysis.bm25(docsOf(
      "spark join table spark spark",  // heavy hits
      "spark runs somewhere else now", // one hit
      "nothing relevant in here at"),  // zero hits -> filtered
      Seq("spark", "join", "table"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) > out(1L) && out(1L) > 0.0)
  }

  test("fingerprint is invariant to case, punctuation, and extra whitespace") {
    val fps = docsOf("Hello,   World!", "hello world", "different text")
      .select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }
}
