package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def embsOf(vs: (Long, Seq[Float])*) =
    vs.map { case (id, v) => (id, v, (id % 2).toInt) }
      .toDF("vec_id", "embedding", "label")

  test("kMeans: separates two tight blobs, labels follow the seeds") {
    // vec 0 seeds cluster 0 near +x, vec 1 seeds cluster 1 near +y
    val df = embsOf(
      0L -> Seq(1f, 0.05f), 1L -> Seq(0.05f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f),
      4L -> Seq(0.95f, 0f), 5L -> Seq(0f, 0.95f))
    val out = Similarity.kMeans(df, 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 2L, 4L).forall(out(_) == 0L))
    assert(Seq(1L, 3L, 5L).forall(out(_) == 1L))
    // fixed iterations from fixed seeds: rerun is identical
    val again = Similarity.kMeans(df, 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("kMeans: a cluster that captures nothing keeps its seed centroid") {
    // both non-seed points sit on +x; seed 1 (+y) ends round 1 empty
    val df = embsOf(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(1f, 0.01f), 3L -> Seq(1f, -0.01f))
    val out = Similarity.kMeans(df, 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // vec 1 still claims its own (carried) centroid; x-axis points go to 0
    assert(out(1L) == 1L && out(0L) == 0L && out(2L) == 0L && out(3L) == 0L)
  }

  test("cosine: identical vectors -> 1.0, orthogonal -> 0.0, opposite -> -1.0") {
    val df = embsOf(0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f),
      3L -> Seq(-1f, 0f))
    val c = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.vec_id") === 0)
      .orderBy(col("b.vec_id"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .as[Double].collect()
    assert(c(0) == 1.0 && c(1) == 1.0 && c(2) == 0.0 && c(3) == -1.0)
  }

  test("brute-force top-k ranks by cosine desc with vec_id tie-break, excludes self") {
    val corpus = embsOf(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0f, 1f),
      3L -> Seq(1f, 0f)) // exact match of query
    val out = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") === 0), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L)) // 3: cos=1, then 1
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
  }

  test("centroid assignment picks nearest centroid, lower id on ties") {
    val corpus = embsOf(10L -> Seq(1f, 0.1f), 11L -> Seq(0.1f, 1f), 12L -> Seq(1f, 1f))
    val cents = Seq(0L -> Array(1f, 0f), 1L -> Array(0f, 1f))
    val out = Similarity.assignToCentroids(corpus, cents)
      .orderBy("vec_id").select("centroid_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 1L, 0L)) // (1,1) ties -> lower centroid id 0
  }

  test("ivf top-k returns ranked neighbors from probed clusters only") {
    val corpus = embsOf(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),          // centroids
      10L -> Seq(1f, 0.1f), 11L -> Seq(1f, 0.2f),    // cluster 0
      12L -> Seq(0.1f, 1f))                          // cluster 1
    val out = Similarity.ivfTopK(corpus, corpus.filter(col("vec_id") < 2),
      corpus.filter(col("vec_id") === 10), k = 3, nprobe = 1)
      .orderBy("rank").collect()
    // nprobe=1 -> only cluster 0 members (0, 10, 11); self excluded
    assert(out.map(_.getLong(1)).toSeq == Seq(11L, 0L))
  }

  test("near-dup pairs stay within blocks and above threshold") {
    val corpus = embsOf(
      0L -> Seq(1f, 0f), 2L -> Seq(1f, 0.01f),  // label 0: near-dups
      1L -> Seq(1f, 0f), 3L -> Seq(0f, 1f))     // label 1: orthogonal
    val out = Similarity.nearDupPairs(corpus, "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 2L)))
  }

  test("near-dup maxBlockSize drops oversized blocks, keeps bounded ones") {
    // label 0 gets 12 members (ids even), label 1 gets 2 (ids 1, 3)
    val big = (0 until 12).map(i => (i * 2).toLong -> Seq(1f, 0f))
    val corpus = embsOf(big ++ Seq(1L -> Seq(1f, 0f), 3L -> Seq(1f, 0.01f)): _*)
    val uncapped = Similarity.nearDupPairs(corpus, "label", 0.9).count()
    assert(uncapped == 12L * 11 / 2 + 1) // quadratic in the big block
    val capped = Similarity.nearDupPairs(corpus, "label", 0.9, maxBlockSize = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 3L)))
  }

  test("semDeDup: keeps the member least similar to its centroid, drops its near-dups") {
    // cluster 0 (+x): three near-identical vectors + one angled survivor;
    // cluster 1 (+y): two orthogonal-ish members, no dups
    val df = embsOf(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),            // seeds
      10L -> Seq(1f, 0.01f), 11L -> Seq(1f, 0.011f),   // dups of each other & of 0
      12L -> Seq(0.8f, 0.6f),                          // same cluster, not a dup at .995
      13L -> Seq(0.3f, 1f))                            // cluster 1, cos(1,13)=.958 < .995
    val out = Similarity.semDeDup(df, 2, 1, threshold = 0.995)
    val kept = out.select("vec_id").as[Long].collect().toSet
    // within each cluster every kept pair must be below the threshold
    val assigned = out.select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val embMap = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    for (a <- kept; b <- kept if a < b && assigned(a) == assigned(b))
      assert(cos(embMap(a), embMap(b)) < 0.995, s"kept near-dup pair ($a,$b)")
    // the angled and cross-cluster members survive; the {0,10,11} dup group
    // collapses to exactly one survivor
    assert(kept.contains(12L) && kept.contains(13L) && kept.contains(1L))
    assert(Seq(0L, 10L, 11L).count(kept) == 1)
    // deterministic: rerun identical
    assert(Similarity.semDeDup(df, 2, 1, threshold = 0.995)
      .select("vec_id").as[Long].collect().toSet == kept)
  }

  test("pqCodes: per-subspace codes match per-slice kMeans assignments") {
    // 4-dim vectors, 2 subspaces of 2: first half separates on x-vs-y,
    // second half on +z-vs-+w, so the two code columns are independent
    val df = embsOf(
      0L -> Seq(1f, 0f, 1f, 0f), 1L -> Seq(0f, 1f, 0f, 1f),  // seeds
      10L -> Seq(0.9f, 0.1f, 0.1f, 0.9f),  // sub0 -> 0, sub1 -> 1
      11L -> Seq(0.1f, 0.9f, 0.9f, 0.1f))  // sub0 -> 1, sub1 -> 0
    val out = Similarity.pqCodes(df, m = 2, dim = 4, k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(10L) == ((0L, 1L)) && out(11L) == ((1L, 0L)))
    // codes agree with running kMeans on each slice independently
    import org.apache.spark.sql.functions.slice
    (0 until 2).foreach { j =>
      val sliced = df.withColumn("embedding", slice(col("embedding"), j * 2 + 1, 2))
      val km = Similarity.kMeans(sliced, 2, 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      out.foreach { case (id, codes) =>
        val code = if (j == 0) codes._1 else codes._2
        assert(code == km(id), s"vec $id subspace $j: pq $code vs kmeans ${km(id)}")
      }
    }
  }

  test("pqTopK: ADC ranking finds the coded twin first, self excluded") {
    // 10 and 11 share identical subspace patterns -> identical codes ->
    // identical reconstructions -> each ranks the other at cos ~ recon-sim
    val df = embsOf(
      0L -> Seq(1f, 0f, 1f, 0f), 1L -> Seq(0f, 1f, 0f, 1f),
      10L -> Seq(0.9f, 0.1f, 0.1f, 0.9f), 11L -> Seq(0.9f, 0.1f, 0.1f, 0.9f),
      12L -> Seq(0.1f, 0.9f, 0.9f, 0.1f))
    val out = Similarity.pqTopK(df, df.filter(col("vec_id") === 10),
      m = 2, dim = 4, k = 2, iters = 1, topK = 4)
      .orderBy("rank").collect()
    assert(!out.map(_.getLong(1)).contains(10L)) // self excluded
    assert(out.head.getLong(1) == 11L)           // the twin ranks first
    // scores come from reconstructions: the twin's ADC cos < 1 unless the
    // centroid equals the vector, but it must beat the opposite-coded 12
    val cosOf = out.map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(cosOf(11L) > cosOf(12L))
  }

  test("semDeDup maxBlockSize: an oversized cluster passes through undeduped") {
    // 10 identical +x vectors (cluster 0) and 2 identical +y (cluster 1)
    val hot = (10L until 20L).map(i => i -> Seq(1f, 0f))
    val df = embsOf(Seq(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 21L -> Seq(0f, 1f)) ++ hot: _*)
    val capped = Similarity.semDeDup(df, 2, 1, threshold = 0.99, maxBlockSize = Some(5))
    val kept = capped.select("vec_id").as[Long].collect().toSet
    // cluster 0 (11 members > cap) is not deduped; cluster 1 (2 members) is
    assert((hot.map(_._1).toSet + 0L).subsetOf(kept))
    assert(Seq(1L, 21L).count(kept) == 1)
  }

  test("LSH near-dup band cap bounds a degenerate (all-identical) corpus") {
    // 30 identical vectors -> every band key has df 30; one cold near-dup
    // pair points the opposite way so its band keys are its own
    val hot = (0 until 30).map(i => i.toLong -> Seq(1f, 0.5f))
    val cold = Seq(100L -> Seq(-1f, -0.5f), 101L -> Seq(-1f, -0.51f))
    val corpus = embsOf(hot ++ cold: _*)
    val planes = Seq(Array(1f, 0f), Array(0f, 1f), Array(1f, 1f), Array(1f, -1f))
    val uncapped = Similarity.nearDupPairsLsh(corpus, planes, 0.9, bandBits = 2)
    assert(uncapped.count() >= 30L * 29 / 2)
    val capped = Similarity.nearDupPairsLsh(corpus, planes, 0.9, bandBits = 2,
      maxBandDf = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)))
  }
}
