package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property checks over the text/dedup operator algebra with random inputs
  * (including degenerate ones the synthetic testdata never produces).
  */
class OpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "cat", "dog", "the", "a", "of", "x1", "!!")
  private val docGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, wordGen))
    .map(_.mkString(" "))

  private def run(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: quality score stays in [0,1] for arbitrary docs (incl. empty)") {
    run(Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      TextAnalysis.qualityScore(df).select("quality").as[Double].collect()
        .forall(q => q >= 0.0 && q <= 1.0)
    })
  }

  test("property: ngram jaccard matches a set-based recomputation") {
    run(Prop.forAll(Gen.listOfN(5, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def shingleSet(t: String): Set[String] = {
        val toks = t.toLowerCase.split("\\s+").toSeq
        if (toks.length < 3) Set.empty
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val expected = (for {
        (a, i) <- texts.zipWithIndex; (b, j) <- texts.zipWithIndex if i < j
        sa = shingleSet(a); sb = shingleSet(b)
        inter = (sa & sb).size if inter > 0
      } yield ((i.toLong, j.toLong), inter.toDouble / (sa ++ sb).size)).toMap
      val got = Dedup.ngramJaccard(df, threshold = 0.0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
      got == expected
    })
  }

  test("property: identical docs are always minhash candidates") {
    run(Prop.forAll(docGen.suchThat(_.split("\\s+").length >= 3)) { text =>
      val df = Seq((0L, text), (1L, text), (2L, "unrelated content entirely here"))
        .toDF("doc_id", "text")
      val pairs = Dedup.minHashCandidates(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs.contains((0L, 1L))
    })
  }

  test("property: minhash-verified output is a subset of the candidate set") {
    run(Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val cands = Dedup.minHashCandidates(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val verified = Dedup.minHashVerified(df, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      verified.subsetOf(cands)
    })
  }
}
