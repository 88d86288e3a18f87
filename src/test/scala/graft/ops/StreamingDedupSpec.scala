package graft.ops

import graft.SparkSpec
import graft.cdc.ManifestStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Persistent-index streaming dedup: per-batch verdicts, cross-batch
  * first-wins, exactly-once replay, and incremental==global equivalence.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def index() = {
    val st = new ManifestStore(
      Files.createTempDirectory("dedup_idx").toString, spark, "fp")
    StreamingDedup.init(st, spark)
    st
  }

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("cross-batch duplicates resolve to the earliest document") {
    val st = index()
    val b0 = docs(Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")))
    val v0 = StreamingDedup.processBatch(st, b0, "doc_id", md5(col("text")),
      batchId = 0)
      .select("doc_id", "is_dup", "dup_of")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), Option(r.get(2))))).toMap
    // in-batch dup: 3 loses to 1
    assert(v0 == Map(1L -> ((0, None)), 2L -> ((0, None)),
      3L -> ((1, Some(1L)))))
    val b1 = docs(Seq((4L, "beta"), (5L, "gamma")))
    val v1 = StreamingDedup.processBatch(st, b1, "doc_id", md5(col("text")),
      batchId = 1)
      .select("doc_id", "is_dup", "dup_of")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), Option(r.get(2))))).toMap
    // cross-batch dup: 4 loses to 2 (from the index), 5 is new
    assert(v1 == Map(4L -> ((1, Some(2L))), 5L -> ((0, None))))
    // index maps each fingerprint to its global first claimant
    val idx = st.read().get.select("fp", "first_doc").as[(String, Long)]
      .collect().toMap
    assert(idx.values.toSet == Set(1L, 2L, 5L))
  }

  test("replaying a batch id is a no-op on the index") {
    val st = index()
    StreamingDedup.processBatch(st, docs(Seq((1L, "a"))), "doc_id",
      md5(col("text")), batchId = 0)
    val v = st.current.get._1
    StreamingDedup.processBatch(st, docs(Seq((9L, "zzz"))), "doc_id",
      md5(col("text")), batchId = 0) // replayed id, different content
    assert(st.current.get._1 == v)
    assert(st.read().get.count() == 1L)
  }

  test("band index: per-batch verdicts equal the global band-min window") {
    val st = new ManifestStore(
      Files.createTempDirectory("band_idx").toString, spark, "bk")
    StreamingDedup.initBands(st, spark)
    // overlapping shingle sets across batches + a shingle-less doc
    val all = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a completely different sentence about spark engines"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "short"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "spark engines shuffle data between executors quickly"))
    val batches = Seq(all.take(2), all.slice(2, 4), all.drop(4))
    val perBatch = batches.zipWithIndex.map { case (b, i) =>
      StreamingDedup.processBandBatch(st, docs(b), batchId = i.toLong)
    }.reduce(_ unionByName _)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // global truth: band -> min doc over the WHOLE corpus
    val bands = Dedup.minHashBands(docs(all))
      .select(col("doc_id"), concat(col("band"), lit(":"), col("key")).as("bk"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bandMin = bands.groupBy(_._2).map { case (bk, xs) =>
      bk -> xs.map(_._1).min }
    val want = all.map { case (id, _) =>
      val mine = bands.filter(_._1 == id).map(_._2)
      val hits = mine.count(bk => bandMin(bk) < id)
      (id, hits.toLong, if (hits > 0) 1 else 0)
    }.toSet
    assert(perBatch == want)
    // and the final-index reread agrees
    val fromIdx = StreamingDedup.verdictsFromBandIndex(st, docs(all))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fromIdx == want)
    // exact duplicate of doc 0 (doc 4) hits on every band
    assert(want.exists { case (id, n, f) => id == 4L && f == 1 && n == 4L })
  }

  test("TTL: expired fingerprints re-admit, retained ones still dedup") {
    val st = index()
    // claims at two distinct times
    StreamingDedup.processBatch(st, docs(Seq((1L, "old"))), "doc_id",
      md5(col("text")), batchId = 0, claimTs = 100L)
    StreamingDedup.processBatch(st, docs(Seq((2L, "new"))), "doc_id",
      md5(col("text")), batchId = 1, claimTs = 150L)
    // expire everything claimed before 120: "old" leaves, "new" stays
    assert(StreamingDedup.expire(st, olderThan = 120L, batchId = 2).isDefined)
    assert(st.read().get.select("fp").count() == 1L)
    // next batch re-offers both contents
    val v = StreamingDedup.processBatch(st,
      docs(Seq((10L, "old"), (11L, "new"))), "doc_id",
      md5(col("text")), batchId = 3, claimTs = 200L)
      .select("doc_id", "is_dup", "dup_of")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), Option(r.get(2))))).toMap
    // expired fp re-admits (10 is the NEW first claimant); retained fp
    // still dedups (11 loses to 2)
    assert(v == Map(10L -> ((0, None)), 11L -> ((1, Some(2L)))))
    val idx = st.read().get.select("fp", "first_doc", "claim_ts")
      .as[(String, Long, Long)].collect()
    assert(idx.map(_._2).toSet == Set(2L, 10L))
    // the re-admitted claim carries ITS claim time, not the expired one's
    assert(idx.find(_._2 == 10L).get._3 == 200L)
    // expiry is replay-guarded like any other index commit
    val ver = st.current.get._1
    assert(StreamingDedup.expire(st, olderThan = 9999L, batchId = 2).isEmpty)
    assert(st.current.get._1 == ver)
  }

  test("TTL on the band index: expired bands re-admit") {
    val st = new ManifestStore(
      Files.createTempDirectory("band_ttl").toString, spark, "bk")
    StreamingDedup.initBands(st, spark)
    val text = "the quick brown fox jumps over the lazy dog"
    StreamingDedup.processBandBatch(st, docs(Seq((1L, text))),
      batchId = 0, claimTs = 100L)
    // duplicate content while the claim is retained: flagged
    val v1 = StreamingDedup.processBandBatch(st, docs(Seq((5L, text))),
      batchId = 1, claimTs = 150L)
      .select("doc_id", "is_candidate_dup").as[(Long, Int)].collect().toMap
    assert(v1 == Map(5L -> 1))
    // note: doc 5 was a pure dup, so no bands re-claimed at ts 150 — every
    // claim still carries ts 100 and expires below
    assert(StreamingDedup.expire(st, olderThan = 120L, batchId = 2).isDefined)
    assert(st.read().get.count() == 0L)
    // same content re-admits as a fresh first claimant
    val v2 = StreamingDedup.processBandBatch(st, docs(Seq((9L, text))),
      batchId = 3, claimTs = 200L)
      .select("doc_id", "is_candidate_dup").as[(Long, Int)].collect().toMap
    assert(v2 == Map(9L -> 0))
  }

  test("incremental over ordered batches equals the global first-wins") {
    val st = index()
    val all = (0L until 60L).map(i => (i, s"t${i % 17}")) // 17 distinct texts
    all.grouped(20).zipWithIndex.foreach { case (chunk, i) =>
      StreamingDedup.processBatch(st, docs(chunk.toSeq), "doc_id",
        md5(col("text")), batchId = i.toLong)
    }
    val got = StreamingDedup.verdictsFromIndex(st, docs(all), "doc_id",
      md5(col("text")))
      .select("doc_id", "is_dup", "dup_of").collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.get(2)))).toSet
    val want = all.map { case (id, t) =>
      val first = all.find(_._2 == t).get._1
      (id, if (id == first) 0 else 1,
        if (id == first) None else Some(first))
    }.toSet
    assert(got == want)
  }
}
