package graft.cdc

import graft.SparkSpec
import graft.cdc.ManifestStore.{AlreadyMerged, MergedAt}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Optimistic concurrency on [[ManifestStore]] — Delta's file-level
  * conflict rule rather than a whole-table CAS: merges from the same
  * parent COMMUTE (loser rebases, zero extra I/O) unless their work
  * genuinely overlaps; real overlaps retry from scratch. The `onDerived`
  * interleave probe makes every lost race deterministic.
  */
class ManifestStoreConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("id", "name")

  private def netDf(rows: Seq[(Long, String, Option[String], Long)]) =
    rows.map { case (id, op, name, ts) =>
      (id, op, if (op == "d") None else Some(id), name, ts)
    }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name",
      Changelog.TsCol)
      .withColumn("after_id", col("after_id").cast("long"))

  private def seeded(): ManifestStore = {
    val st = new ManifestStore(
      Files.createTempDirectory("mcas").toString, spark, "id")
    st.commit((0L until 200L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 8)
    st
  }

  /** Every data file or sidecar on disk that no retained manifest
    * references — ALL sidecar kinds count (dv, bloom, column blooms,
    * kmv), or a live sketch reads as an orphan.
    */
  private def orphans(st: ManifestStore): Seq[String] = {
    val referenced = (0L to st.current.get._1)
      .flatMap(st.manifest(_).toSeq.flatMap(_.files.flatMap(f =>
        f.name +: (f.dv.toSeq ++ f.bloom.toSeq ++ f.colBlooms.values ++
          f.kmv.toSeq)))).toSet
    val s = Files.list(Paths.get(st.root, "files"))
    try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      .map(_.getFileName.toString).filterNot(referenced)
    finally s.close()
  }

  test("disjoint concurrent merges commute: the loser rebases, no retry") {
    val st = seeded()
    // writer A lands an update to a HIGH key while B is mid-derivation on
    // a LOW key — their touched files are disjoint, so B must rebase onto
    // A's version instead of redoing its merge
    var fired = false
    val out = st.mergeOptimisticHook(
      netDf(Seq((5L, "u", Some("from_b"), 100L))), fields,
      batchId = 1, streamId = "writer_b", tsGuard = true, maxAttempts = 1) {
      () =>
        if (!fired) {
          fired = true
          assert(st.merge(netDf(Seq((190L, "u", Some("from_a"), 100L))),
            fields, batchId = 1, streamId = "writer_a").isDefined)
        }
    }
    // maxAttempts = 1: only the rebase path (not a retry) can land this
    val stats = out.asInstanceOf[MergedAt].stats
    assert(stats.version == 2L && stats.rewrittenFiles == 1)
    val rows = st.read().get.filter(col("id").isin(5L, 190L))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(rows == Map(5L -> "from_b", 190L -> "from_a"))
    assert(st.read().get.count() == 200L)
    assert(orphans(st).isEmpty)
  }

  test("overlapping file rewrite: the loser re-derives against the winner") {
    val st = seeded()
    // both writers hit the SAME low-range file: rebase check (b) fails,
    // attempt 2 re-derives from A's version and applies on top
    var fired = false
    val out = st.mergeOptimisticHook(
      netDf(Seq((6L, "u", Some("from_b"), 100L))), fields,
      batchId = 1, streamId = "writer_b", tsGuard = true, maxAttempts = 3) {
      () =>
        if (!fired) {
          fired = true
          assert(st.merge(netDf(Seq((5L, "u", Some("from_a"), 100L))),
            fields, batchId = 1, streamId = "writer_a").isDefined)
        }
    }
    assert(out.asInstanceOf[MergedAt].stats.version == 2L)
    val rows = st.read().get.filter(col("id").isin(5L, 6L))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(rows == Map(5L -> "from_a", 6L -> "from_b"))
    assert(st.read().get.count() == 200L)
    // the failed attempt's data files were reclaimed eagerly
    assert(orphans(st).isEmpty)
  }

  test("concurrent insert into the batch's key range forces a re-derive") {
    val st = seeded()
    // A INSERTS key 10000 while B derives an update of key 10000 against a
    // parent where no file contains it. A naive rebase would carry A's
    // growth file AND add B's upsert — key 10000 twice. Check (c) catches
    // it: B retries and its update applies ON TOP of A's insert.
    var fired = false
    val out = st.mergeOptimisticHook(
      netDf(Seq((10000L, "u", Some("from_b"), 200L))), fields,
      batchId = 1, streamId = "writer_b", tsGuard = true, maxAttempts = 3) {
      () =>
        if (!fired) {
          fired = true
          assert(st.merge(netDf(Seq((10000L, "c", Some("from_a"), 100L))),
            fields, batchId = 1, streamId = "writer_a").isDefined)
        }
    }
    assert(out.asInstanceOf[MergedAt].stats.version == 2L)
    val hits = st.read().get.filter(col("id") === 10000L)
      .select("name").as[String].collect().toSeq
    assert(hits == Seq("from_b"), s"expected one row, got $hits")
    assert(st.read().get.count() == 201L)
    assert(orphans(st).isEmpty)
  }

  test("exactly-once survives the optimistic path") {
    val st = seeded()
    assert(st.mergeOptimistic(netDf(Seq((1L, "u", Some("once"), 100L))),
      fields, batchId = 1, streamId = "s1").isInstanceOf[MergedAt])
    assert(st.mergeOptimistic(netDf(Seq((1L, "u", Some("twice"), 200L))),
      fields, batchId = 1, streamId = "s1") == AlreadyMerged)
    assert(st.read().get.filter(col("id") === 1L).select("name")
      .as[String].collect().toSeq == Seq("once"))
  }

  test("deleteWhere racing a concurrent merge retries; both effects survive") {
    val st = seeded()
    // writer A lands a merge while the delete is between sidecar staging
    // and its commit lock: the delete's CAS fails, its staged sidecars are
    // reclaimed, and the retry re-derives against A's version — the merge
    // can no longer be clobbered by a last-rename-wins swap
    var fired = false
    val out = st.deleteWhereHook(col("id") >= 190L, Some((1L, "deleter")),
      maxAttempts = 3) { () =>
      if (!fired) {
        fired = true
        assert(st.merge(netDf(Seq((5L, "u", Some("from_merge"), 100L))),
          fields, batchId = 1, streamId = "merger").isDefined)
      }
    }
    // retry landed on top of the merge: v1 = merge, v2 = delete
    assert(out.isDefined && out.get.version == 2L)
    val t = st.read().get
    assert(t.count() == 190L)
    assert(t.filter(col("id") === 5L).select("name").as[String]
      .collect().toSeq == Seq("from_merge"))
    assert(t.filter(col("id") >= 190L).isEmpty)
    // the lost attempt's staged sidecars were reclaimed eagerly
    assert(orphans(st).isEmpty)
  }

  test("deleteWhere with one attempt fails loudly on a lost race") {
    val st = seeded()
    var fired = false
    val e = intercept[IllegalStateException] {
      st.deleteWhereHook(col("id") >= 190L, Some((1L, "deleter")),
        maxAttempts = 1) { () =>
        if (!fired) {
          fired = true
          assert(st.merge(netDf(Seq((5L, "u", Some("from_merge"), 100L))),
            fields, batchId = 1, streamId = "merger").isDefined)
        }
      }
    }
    assert(e.getMessage.contains("lost the commit race"))
    // the merge's effect is intact and nothing was deleted
    val t = st.read().get
    assert(t.count() == 200L)
    assert(t.filter(col("id") === 5L).select("name").as[String]
      .collect().toSeq == Seq("from_merge"))
    assert(orphans(st).isEmpty)
  }

  test("a racing merge rebases past a committed deleteWhere on other files") {
    val st = seeded()
    // the delete masks the HIGH file while the merge rewrites the LOW one:
    // touched (name, dv) identities are untouched by the delete, so the
    // merge rebases — and carries the delete's new sidecar by reference
    var fired = false
    val out = st.mergeOptimisticHook(
      netDf(Seq((5L, "u", Some("from_b"), 100L))), fields,
      batchId = 1, streamId = "writer_b", tsGuard = true, maxAttempts = 1) {
      () =>
        if (!fired) {
          fired = true
          assert(st.deleteWhere(col("id") >= 190L, batchId = 1,
            streamId = "deleter").isDefined)
        }
    }
    // maxAttempts = 1: only the rebase path can land this
    assert(out.asInstanceOf[MergedAt].stats.version == 2L)
    val t = st.read().get
    assert(t.count() == 190L)
    assert(t.filter(col("id") === 5L).select("name").as[String]
      .collect().toSeq == Seq("from_b"))
    assert(t.filter(col("id") >= 190L).isEmpty)
    assert(orphans(st).isEmpty)
  }

  test("a racing merge re-derives when deleteWhere re-masked its file") {
    val st = seeded()
    // both hit the HIGH file: the delete changes its (name, dv) identity,
    // rebase check (b) fails, and the merge's retry applies on top of the
    // delete — its update re-inserts the deleted key (ts-guarded upsert).
    // The retry lands at the delete's version + 1; the row count is the
    // real witness — a naive rebase would drop the delete's sidecar and
    // resurrect all 10 deleted rows (count 200)
    var fired = false
    val out = st.mergeOptimisticHook(
      netDf(Seq((195L, "u", Some("from_b"), 200L))), fields,
      batchId = 1, streamId = "writer_b", tsGuard = true, maxAttempts = 3) {
      () =>
        if (!fired) {
          fired = true
          assert(st.deleteWhere(col("id") >= 190L, batchId = 1,
            streamId = "deleter").isDefined)
        }
    }
    assert(out.asInstanceOf[MergedAt].stats.version == 2L)
    val t = st.read().get
    assert(t.count() == 191L) // 200 - 10 deleted + 1 re-upserted
    assert(t.filter(col("id") === 195L).select("name").as[String]
      .collect().toSeq == Seq("from_b"))
    assert(orphans(st).isEmpty)
  }

  test("genuinely concurrent writers all land via rebase or retry") {
    val st = seeded()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // four writers, each updating a different range decile
    val outs = Await.result(Future.sequence(Seq(3L, 53L, 103L, 153L).map(k =>
      Future(st.mergeOptimistic(
        netDf(Seq((k, "u", Some(s"w$k"), 100L))), fields,
        batchId = 1, streamId = s"w$k", maxAttempts = 8)))), 4.minutes)
    assert(outs.forall(_.isInstanceOf[MergedAt]), outs.toString)
    assert(st.current.get._1 == 4L) // 4 commits on top of the v0 seed
    val got = st.read().get.filter(col("id").isin(3L, 53L, 103L, 153L))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(got == Map(3L -> "w3", 53L -> "w53", 103L -> "w103", 153L -> "w153"))
    assert(st.read().get.count() == 200L)
    assert(orphans(st).isEmpty)
  }
}
