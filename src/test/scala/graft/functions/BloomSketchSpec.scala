package graft.functions

import graft.SparkSpec
import graft.ops.BloomOps
import org.apache.spark.sql.functions._

class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"document body number $i")).toDF("id", "k")

  test("no false negatives: every inserted item probes true") {
    val d = docs(500)
    val blob = BloomOps.build(d.filter($"id" % 3 === 0), $"k", 4096, 5)
    val misses = d.filter($"id" % 3 === 0)
      .filter(!BloomOps.maybeContains(blob, $"k")).count()
    assert(misses == 0L)
  }

  test("false positives are rare at the sized capacity") {
    val d = docs(3000)
    // ~1000 items in 16384 bits, k=7 -> theoretical fpr well under 1%
    val blob = BloomOps.build(d.filter($"id" % 3 === 0), $"k", 16384, 7)
    val fps = d.filter($"id" % 3 =!= 0)
      .filter(BloomOps.maybeContains(blob, $"k")).count()
    assert(fps <= 20L, s"fp count $fps exceeds sanity ceiling")
  }

  test("build is partitioning-invariant and blobs OR-merge to the whole") {
    val d = docs(400)
    val whole = BloomOps.build(d, $"k", 2048, 5)
    val whole1 = BloomOps.build(d.repartition(13), $"k", 2048, 5)
    assert(java.util.Arrays.equals(whole, whole1))
    val a = BloomOps.build(d.filter($"id" < 200), $"k", 2048, 5)
    val b = BloomOps.build(d.filter($"id" >= 200), $"k", 2048, 5)
    val (wa, bits, hashes) = BloomSketch.decode(a)
    val (wb, _, _) = BloomSketch.decode(b)
    val ored = wa.zip(wb).map { case (x, y) => x | y }
    assert(java.util.Arrays.equals(BloomSketch.encode(ored, bits, hashes), whole))
  }

  test("decontaminate equals the exact anti-join") {
    val corpus = docs(800)
    val dirty = docs(800).filter($"id" % 7 === 0).select($"k")
    val got = BloomOps.decontaminate(corpus, dirty, "k", 1024, 5)
      .select("id").as[Long].collect().sorted
    val want = corpus.join(dirty, Seq("k"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("decontaminate keeps null-keyed rows as clean") {
    val corpus = docs(100)
      .unionByName(Seq((1000L, null.asInstanceOf[String]),
        (1001L, null.asInstanceOf[String])).toDF("id", "k"))
    val dirty = docs(100).filter($"id" % 7 === 0).select($"k")
    val got = BloomOps.decontaminate(corpus, dirty, "k", 1024, 5)
    // a null key cannot match the blocklist: the rows survive, they don't
    // silently vanish between the two branch filters
    assert(got.filter($"id" >= 1000L).count() == 2L)
    // the exact anti-join also keeps null-keyed rows (null never matches),
    // so the lossless equality holds verbatim
    assert(got.count() == corpus.join(dirty, Seq("k"), "left_anti").count())
  }

  test("fpr report gates hold on a disjoint probe set") {
    val corpus = docs(1000)
    val dirty = corpus.filter($"id" % 5 === 0).select($"k")
    val r = BloomOps.fprReport(corpus, dirty, "k", 8192, 6, fpCeiling = 50L)
      .collect()(0)
    assert(r.getAs[Long]("n_probes") == 1000L)
    assert(r.getAs[Long]("n_true") == 200L)
    assert(r.getAs[Boolean]("no_false_negatives"))
    assert(r.getAs[Boolean]("fp_within_ceiling"))
  }

  test("probe works from SQL and survives codegen") {
    val d = docs(100)
    val blob = BloomOps.build(d, $"k", 1024, 4)
    d.createOrReplaceTempView("bloom_probe_t")
    val hex = blob.map(b => f"$b%02X").mkString
    val cnt = spark.sql(
      s"SELECT count(*) FROM bloom_probe_t WHERE bloom_maybe_contains(X'$hex', k)")
      .as[Long].collect()(0)
    assert(cnt == 100L)
  }
}
