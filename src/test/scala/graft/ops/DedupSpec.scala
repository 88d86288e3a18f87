package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("exact dedup canonicalizes normalized-identical docs to min doc_id") {
    val out = Dedup.exact(docsOf("The cat!", "the   cat", "a dog"))
      .orderBy("doc_id")
      .select("canonical_id", "is_dup").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((0L, 0), (0L, 1), (2L, 0)))
  }

  test("shingles are distinct 3-grams; short docs yield none") {
    val sh = docsOf("a b c d", "x y")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
      .orderBy("doc_id").collect()
    assert(sh(0).getSeq[String](1).toSet == Set("a b c", "b c d"))
    assert(sh(1).getSeq[String](1).isEmpty)
  }

  test("prefix-filtered Jaccard join equals the brute inverted-index join") {
    // random word soup over a small vocab forces overlapping shingle sets,
    // pairs straddling the threshold, and shared hot shingles — the cases
    // where an undersized prefix would drop a true pair
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0L until 60L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val brute = key(Dedup.ngramJaccard(docs, 0.2))
    assert(brute.nonEmpty) // the fixture must actually exercise pairs
    assert(key(Dedup.prefixJaccard(docs, 1, 5)) == brute)
    // a second threshold where ceil(t*n) rounds on small n
    assert(key(Dedup.prefixJaccard(docs, 2, 5)) == key(Dedup.ngramJaccard(docs, 0.4)))
  }

  test("minhash LSH finds identical docs as candidates, not unrelated ones") {
    val out = Dedup.minHashCandidates(docsOf(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "completely unrelated text with different shingle content entirely"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L)))
  }

  test("simhash: identical docs share a signature; signature is 32 bits") {
    val out = Dedup.simHash(docsOf("alpha beta gamma", "alpha beta gamma", "zzz qqq"))
      .orderBy("doc_id").select("simhash").as[String].collect()
    assert(out(0) == out(1))
    assert(out(0).length == 32 && out(0).forall(c => c == '0' || c == '1'))
    assert(out(0) != out(2))
  }

  test("ngram jaccard: identical docs score 1.0; disjoint docs absent") {
    val out = Dedup.ngramJaccard(docsOf(
      "a b c d e", "a b c d e", "q w e r t y"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(out.toSeq == Seq((0L, 1L, 1.0)))
  }

  test("containment catches doc-in-doc that jaccard dilutes away") {
    // doc 1 is doc 0's text embedded in a much longer page: every shingle
    // of 0 appears in 1, so containment = 1.0 while jaccard stays small
    val short = "alpha beta gamma delta epsilon"
    val wrapper = "nav home about " + short + " footer terms privacy contact " +
      "copyright two thousand twenty four all rights reserved legal notice"
    val out = Dedup.containmentPairs(docsOf(short, wrapper, "q w e r t y"),
      threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(out.toSeq == Seq((0L, 1L, 1.0)))
    // the same pair is invisible to jaccard at any comparable threshold
    assert(Dedup.ngramJaccard(docsOf(short, wrapper, "q w e r t y"),
      threshold = 0.5).count() == 0)
  }

  test("simhash pairs: identical docs at hamming 0; unrelated pairs filtered") {
    val out = Dedup.simHashPairs(docsOf(
      "alpha beta gamma delta", "alpha beta gamma delta",
      "qq ww ee rr tt yy uu ii"), maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L, 0L)))
  }

  test("minhash-verified: candidates confirmed by exact jaccard") {
    val out = Dedup.minHashVerified(docsOf(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "something else entirely different here okay"), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0L, 1L, 1.0)))
  }

  test("dedup clusters: chains merge into one component, min id wins (both regimes)") {
    import spark.implicits._
    // components: {1,2,3} via 1-2, 2-3 (a chain, not a clique) and {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    val local = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expect)
    // threshold 0 forces the distributed join loop: identical output
    val dist = Dedup.dedupClusters(pairs, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expect)
  }

  test("dedup clusters: a long path converges (diameter > 2)") {
    import spark.implicits._
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // threshold 0 pins the distributed loop — this test exists to cover
    // multi-round convergence, which the local regime never exercises
    val out = Dedup.dedupClusters(pairs, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(1)).distinct.toSeq
    assert(out == Seq(1L)) // all 8 nodes in one component labeled 1
  }

  test("dedup clusters: pointer doubling converges a 64-deep chain in O(log d)") {
    import spark.implicits._
    // diameter 63 >> the 10-round budget: only the doubling hop gets there;
    // threshold 0 pins the distributed loop (the local regime has no rounds)
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupClusters(pairs, maxIters = 10, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(1)).distinct.toSeq
    assert(out == Seq(1L))
  }

  test("ngram jaccard maxDf cap suppresses hot-shingle pair generation") {
    // shingle "a b c" appears in all 3 docs; cap df<=2 kills all pairs
    val docs = docsOf("a b c x", "a b c y", "a b c z")
    assert(Dedup.ngramJaccard(docs, 0.0, maxDf = Some(2)).count() == 0)
    assert(Dedup.ngramJaccard(docs, 0.0).count() == 3)
  }

  // degenerate corpus for the hot-band guards: 40 identical docs (every
  // band key has df 40 -> the collision join alone is 40*39/2 pairs per
  // band) plus one genuine near-dup pair with cold band keys
  private def degenerate = {
    val hot = Seq.fill(40)("spam spam spam spam spam")
    val cold = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog tonight")
    docsOf(hot ++ cold: _*)
  }

  test("minhash band cap bounds a degenerate corpus; keeps cold-band pairs") {
    val uncapped = Dedup.minHashCandidates(degenerate).count()
    assert(uncapped >= 40L * 39 / 2) // quadratic in the hot key without the cap
    val capped = Dedup.minHashCandidates(degenerate, maxBandDf = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((40L, 41L))) // hot bands dropped, genuine pair kept
  }

  test("simhash band cap bounds a degenerate corpus; keeps cold-band pairs") {
    val uncapped = Dedup.simHashPairs(degenerate, maxHamming = 3).count()
    assert(uncapped >= 40L * 39 / 2)
    val capped = Dedup.simHashPairs(degenerate, maxHamming = 3, maxBandDf = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((40L, 41L)))
  }

  test("minhash-verified passes the band cap through to candidate generation") {
    val capped = Dedup.minHashVerified(degenerate, threshold = 0.2,
      maxBandDf = Some(8)).count()
    assert(capped == 1L)
  }

  test("span stats: cross-doc repeated spans counted; short docs zero") {
    val out = Dedup.spanStats(docsOf(
      "a b c d e f", "a b c d e zz", "q w r t y u i", "x y"), n = 5, minDf = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 0.5), (1L, 2L, 1L, 0.5), (2L, 3L, 0L, 0.0), (3L, 0L, 0L, 0.0)))
  }

  test("span stats: minDf above corpus duplication flags nothing") {
    val out = Dedup.spanStats(docsOf("a b c d e f", "a b c d e zz"), n = 5, minDf = 3)
    assert(out.filter(col("n_dup_spans") > 0).count() == 0)
  }

  test("incremental near-dups: batch doc matching history flagged; fresh not") {
    val all = docsOf(
      "the quick brown fox jumps over the lazy dog",        // 0 history
      "some other document entirely about cooking pasta",   // 1 history
      "the quick brown fox jumps over the lazy dog",        // 2 batch, dup of 0
      "fresh unseen content talking about mountains today") // 3 batch, new
    val out = Dedup.incrementalNearDups(
      all.filter(col("doc_id") < 2), all.filter(col("doc_id") >= 2))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((2L, 4L, 1), (3L, 0L, 0)))
  }

  test("incremental near-dups: history hot-band cap suppresses degenerate matches") {
    // 40 identical spam docs in history: with cap 8 their band keys drop, so
    // a spam batch doc is NOT flagged, while a cold-band genuine dup still is
    val all = docsOf(Seq.fill(40)("spam spam spam spam spam") ++ Seq(
      "the quick brown fox jumps over the lazy dog",        // 40 history, cold
      "spam spam spam spam spam",                           // 41 batch
      "the quick brown fox jumps over the lazy dog"): _*)   // 42 batch
    val out = Dedup.incrementalNearDups(
      all.filter(col("doc_id") <= 40), all.filter(col("doc_id") >= 41),
      maxBandDf = Some(8))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.toSeq == Seq((41L, 0), (42L, 1)))
  }
}
