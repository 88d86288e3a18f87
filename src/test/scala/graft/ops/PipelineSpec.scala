package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("leakageSafeSplit: cluster members share a split, singletons route by id") {
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two clusters: {3,17,42} labeled 3 and {5,9} labeled 5
    val clusters = Seq((3L, 3L), (17L, 3L), (42L, 3L), (5L, 5L), (9L, 5L))
      .toDF("doc_id", "cluster_id")
    val out = Pipeline.leakageSafeSplit(docs, clusters)
      .select("doc_id", "rep", "split")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(Seq(3L, 17L, 42L).map(out(_)).distinct.size == 1)
    assert(Seq(5L, 9L).map(out(_)).distinct.size == 1)
    assert(out(7L)._1 == 7L) // singleton: rep is itself
    // singleton routing matches the plain hash split bit-for-bit
    val plain = Pipeline.hashSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.filterNot(kv => Seq(3L, 17L, 42L, 5L, 9L).contains(kv._1))
      .forall { case (id, (_, s)) => s == plain(id) })
    assert(out.size == 100)
  }

  test("hash split is deterministic, total, and roughly 75/12.5/12.5") {
    val docs = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Pipeline.hashSplit(docs, "doc_id")
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000)
    assert(counts("train") > 650 && counts("train") < 850)
    assert(counts("val") > 50 && counts("test") > 50)
    // deterministic: recompute matches
    val again = Pipeline.hashSplit(docs, "doc_id")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("sequence packing: bins respect the running token budget per shard") {
    val docs = (0L until 64L).map(i => (i, Seq.fill(10)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Pipeline.packSequences(docs, nShards = 4, budget = 25)
    // every doc has 10 tokens; shard = doc_id % 4 -> 16 docs/shard;
    // bin boundaries at cumulative-before DIV 25: docs 0,1,2 -> bins 0,0,0
    // (0,10,20), doc 3 -> bin 1 (30), ...
    val byShard = out.collect().groupBy(_.getLong(1))
    assert(byShard.keySet == Set(0L, 1L, 2L, 3L))
    byShard.values.foreach { rows =>
      val bins = rows.sortBy(_.getLong(0)).map(_.getLong(3)).toSeq
      assert(bins == Seq(0, 0, 0, 1, 1, 2, 2, 2, 3, 3, 4, 4, 4, 5, 5, 6))
    }
    // n_tokens is exact
    assert(out.select("n_tokens").distinct().as[Long].collect().toSeq == Seq(10L))
  }

  test("packing budget invariant holds at any shard count, incl. derived") {
    // variable-length docs: doc i has (i % 7) + 1 tokens
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill((i % 7).toInt + 1)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 16
    // invariant: within every (shard, bin), the tokens BEFORE the last doc
    // (relative to the bin's start) stay under the budget — i.e. a doc only
    // opens a new bin when the current one cannot take it
    def checkInvariant(nShards: Int): Unit = {
      val rows = Pipeline.packSequences(docs, nShards, budget).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      rows.groupBy(_._2).values.foreach { shard =>
        var before = 0L
        shard.sortBy(_._1).foreach { case (_, _, n, bin) =>
          assert(bin == before / budget) // greedy contiguous assignment
          before += n
        }
      }
      // shard routing is doc_id mod nShards, total rows preserved
      assert(rows.length == 200)
      assert(rows.forall { case (id, s, _, _) => s == id % nShards })
    }
    checkInvariant(4)
    checkInvariant(8)  // doubling shards preserves the per-bin invariant
    val derived = Pipeline.adaptiveShards(docs, targetDocsPerShard = 50)
    assert(derived == 4) // 200 docs / 50 per shard
    checkInvariant(derived)
    // auto variant routes through the same invariant-preserving pack
    assert(Pipeline.packSequencesAuto(docs, budget, 50).count() == 200)
  }

  test("chunk: covers the text with the configured overlap, short docs yield one chunk") {
    val docs = Seq(
      (0L, "a" * 10),            // shorter than size -> 1 chunk
      (1L, "x" * 400),           // exactly size -> 1 chunk
      (2L, ("0123456789" * 75)), // 750 chars: chunks at 0 and 350 (350+400 covers 750)
      (3L, "")).toDF("doc_id", "text")
    val out = Pipeline.chunk(docs, size = 400, overlap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byDoc(0L) == Seq("a" * 10))
    assert(byDoc(1L) == Seq("x" * 400))
    assert(byDoc(3L) == Seq(""))
    val c2 = byDoc(2L)
    assert(c2.length == 2 && c2(0).length == 400 && c2(1).length == 400)
    // consecutive chunks agree on the 50-char overlap, and stripping the
    // overlap reconstructs the original text exactly
    assert(c2(0).takeRight(50) == c2(1).take(50))
    assert(c2(0) + c2(1).drop(50) == "0123456789" * 75)
  }

  test("globalShuffle: contiguous seeded permutation, immune to downstream coalesce") {
    val docs = (0L until 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Pipeline.globalShuffle(docs, "doc_id", "ep0")
    val rows = out.select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // pos is a permutation of 0..n-1
    assert(rows.map(_._2).sorted.toSeq == (0L until 300L).toSeq)
    // matches the reference ordering: rank by (md5("ep0:"+id), id)
    val expected = rows.map(_._1).sortBy { id =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ep0:$id".getBytes("UTF-8"))
      (d.map("%02x".format(_)).mkString, id)
    }.zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(rows.forall { case (id, pos) => expected(id) == pos })
    // regression: a downstream coalesce(1) must not perturb positions (a
    // TaskContext-keyed counter silently restarts per parent partition)
    val coalesced = out.coalesce(1).select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall { case (id, pos) => coalesced(id) == pos })
    // different seed -> different permutation (with overwhelming probability)
    val other = Pipeline.globalShuffle(docs, "doc_id", "ep1")
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.exists { case (id, pos) => other(id) != pos })
  }

  test("tfidf top-k ranks rare terms above common ones") {
    val docs = Seq(
      (0L, "apple banana banana common"),
      (1L, "apple common common zebra"),
      (2L, "common plain words here")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, 2)
    // doc 0: banana (tf=2, df=1) must outrank common (df=3, idf=0)
    val doc0 = out.filter(col("doc_id") === 0).orderBy("rank")
      .select("term").as[String].collect().toSeq
    assert(doc0.head == "banana")
    assert(!doc0.contains("common")) // idf 0 -> score 0 ranks last
    // every doc gets at most k rows, ranks start at 1
    val perDoc = out.groupBy("doc_id").count().select("count").as[Long].collect()
    assert(perDoc.forall(_ <= 2))
    assert(out.filter(col("rank") === 1).count() == 3)
  }

  test("lsh near-dup pairs: identical vectors found without labels, ordered a<b") {
    val vecs = Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0f, 0f, 1f, 0f), 3L -> Seq(0f, 0f, 0f, 1f),
      100L -> Seq(0.9f, 0.1f, 0f, 0f), 101L -> Seq(0.9f, 0.1f, 0f, 0f),
      102L -> Seq(0f, 0f, -1f, -1f))
      .map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val planes = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val out = Similarity.nearDupPairsLsh(vecs, planes, 0.99, bandBits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((100L, 101L)))
    assert(out.forall { case (a, b) => a < b })
  }

  test("rhp lsh top-k finds the exact duplicate of a query") {
    val vecs = Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0f, 0f, 1f, 0f), 3L -> Seq(0f, 0f, 0f, 1f), // the 4 planes
      100L -> Seq(0.9f, 0.1f, 0f, 0f), 101L -> Seq(0.9f, 0.1f, 0f, 0f),
      102L -> Seq(-0.9f, 0.2f, 0f, 0f))
      .map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val planes = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val out = Similarity.rhpTopK(vecs, planes,
      vecs.filter(col("vec_id") === 100), k = 3, bandBits = 1)
    val top = out.orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(top.head == 101L) // identical vector ranks first
    assert(!top.contains(100L)) // self excluded
  }
}
