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

  test("property: as-of join matches the naive range-join + argmax") {
    val rowGen = for {
      k <- Gen.choose(0L, 3L); ts <- Gen.choose(0L, 20L); v <- Gen.choose(0, 99)
    } yield (k, ts, v.toDouble)
    run(Prop.forAll(Gen.listOfN(12, rowGen), Gen.listOfN(8, rowGen)) { (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, ts, _), i) => (i.toLong, k, ts) }
        .toDF("id", "k", "ts")
      // right side unique per (k, ts): keep max v (the operator contract)
      val rMap = rs.groupBy(t => (t._1, t._2)).map { case ((k, ts), g) =>
        (k, ts, g.map(_._3).max) }.toSeq
      val r = rMap.toDF("k", "ts", "v")
      val got = AsofJoin.backward(l, r, Seq("k"), "ts", Seq("v"))
        .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
      val expected = ls.zipWithIndex.map { case ((k, ts, _), i) =>
        val matches = rMap.filter(t => t._1 == k && t._2 <= ts)
        i.toLong -> (if (matches.isEmpty) None
                     else Some(matches.maxBy(_._2)._3.asInstanceOf[Any]))
      }.toMap
      got == expected
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
