package graft.cdc

import graft.SparkSpec
import graft.cdc.ManifestStore.{MorApplied, MorConflict, MorReplayed}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Optimistic concurrency for MERGE-ON-READ commits — the deletion-vector
  * twin of [[ManifestStoreConcurrencySpec]]: MoR commits from the same
  * parent COMMUTE (the loser re-targets its replacement sidecars onto the
  * winner's manifest) unless their masks genuinely collide — two writers
  * masking the SAME file conflict (the loser's sidecar union was computed
  * against a stale parent sidecar) and retry from the winner's version.
  * The `onDerived` interleave probe makes every race deterministic.
  */
class ManifestStoreMorConcurrencySpec extends SparkSpec {
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
      Files.createTempDirectory("morcas").toString, spark, "id")
    st.commit((0L until 200L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 8)
    st
  }

  /** Data files, sidecars or change files no retained manifest references. */
  private def orphans(st: ManifestStore): Seq[String] = {
    val referenced = (0L to st.current.get._1)
      .flatMap(st.manifest(_).toSeq.flatMap(m =>
        m.cdcFile.toSeq ++ m.files.flatMap(f =>
          f.name +: (f.dv.toSeq ++ f.bloom.toSeq ++ f.colBlooms.values ++
            f.kmv.toSeq)))).toSet
    val s = Files.list(Paths.get(st.root, "files"))
    try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      .map(_.getFileName.toString).filterNot(referenced)
    finally s.close()
  }

  private def morHook(st: ManifestStore, net: org.apache.spark.sql.DataFrame,
                      batchId: Long, streamId: String, maxAttempts: Int)
                     (probe: () => Unit): ManifestStore.MorOutcome =
    st.mergeOnReadOptimisticHook(net, fields, batchId, streamId,
      tsGuard = true, maxAttempts)(probe)

  test("two scattered MoR merges on disjoint files: the loser rebases") {
    val st = seeded()
    // A masks a HIGH-range file while B is mid-derivation on a LOW key:
    // B's replacement sidecar targets a file A carried by reference, so B
    // must rebase onto A's version — re-linking its sidecar AND keeping
    // A's — with maxAttempts = 1 proving no retry was needed
    var fired = false
    val out = morHook(st, netDf(Seq((5L, "u", Some("from_b"), 100L))),
      batchId = 1, streamId = "writer_b", maxAttempts = 1) { () =>
      if (!fired) {
        fired = true
        assert(st.mergeOnRead(netDf(Seq((190L, "u", Some("from_a"), 100L))),
          fields, batchId = 1, streamId = "writer_a").isDefined)
      }
    }
    val stats = out.asInstanceOf[MorApplied].stats
    assert(stats.version == 2L && stats.maskedFiles == 1)
    val rows = st.read().get.filter(col("id").isin(5L, 190L))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(rows == Map(5L -> "from_b", 190L -> "from_a"))
    assert(st.read().get.count() == 200L)
    // BOTH writers' sidecars are live in the rebased manifest
    assert(st.currentManifest.get.files.count(_.dv.isDefined) == 2)
    assert(orphans(st).isEmpty)
  }

  test("both writers mask the same file: conflict, never a clobber") {
    val st = seeded()
    // A and B both supersede keys of the SAME low-range file. B's staged
    // sidecar = parent-mask ∪ {6}, computed before A's ∪ {5} landed — a
    // rebase would DROP A's mask and resurrect key 5's old row. With one
    // attempt this must surface as a conflict...
    var fired = false
    val out = morHook(st, netDf(Seq((6L, "u", Some("from_b"), 100L))),
      batchId = 1, streamId = "writer_b", maxAttempts = 1) { () =>
      if (!fired) {
        fired = true
        assert(st.mergeOnRead(netDf(Seq((5L, "u", Some("from_a"), 100L))),
          fields, batchId = 1, streamId = "writer_a").isDefined)
      }
    }
    assert(out.isInstanceOf[MorConflict],
      s"same-file double-mask must conflict, got $out")
    assert(out.asInstanceOf[MorConflict].reason.contains("re-masked"))
    // the loser's staged sidecar/upsert were reclaimed; A's commit intact
    assert(orphans(st).isEmpty)
    assert(st.read().get.filter(col("id") === 5L).select("name")
      .as[String].collect().toSeq == Seq("from_a"))
    // ...and with retries left, the loser re-derives on top of the winner
    var fired2 = false
    val out2 = morHook(st, netDf(Seq((6L, "u", Some("from_b"), 100L))),
      batchId = 2, streamId = "writer_b", maxAttempts = 3) { () =>
      if (!fired2) {
        fired2 = true
        assert(st.mergeOnRead(netDf(Seq((7L, "u", Some("late_a"), 100L))),
          fields, batchId = 2, streamId = "writer_a").isDefined)
      }
    }
    assert(out2.asInstanceOf[MorApplied].stats.version == 3L)
    val got = st.read().get.filter(col("id").isin(5L, 6L, 7L))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(got == Map(5L -> "from_a", 6L -> "from_b", 7L -> "late_a"))
    assert(st.read().get.count() == 200L)
    assert(orphans(st).isEmpty)
  }

  test("MoR merge rebases past a committed deleteWhere on other files") {
    val st = seeded()
    // the delete masks the HIGH file while the MoR merge masks the LOW
    // one: disjoint (name, dv) identities, so the merge rebases and the
    // delete's sidecar survives by reference
    var fired = false
    val out = morHook(st, netDf(Seq((5L, "u", Some("from_b"), 100L))),
      batchId = 1, streamId = "writer_b", maxAttempts = 1) { () =>
      if (!fired) {
        fired = true
        assert(st.deleteWhere(col("id") >= 190L, batchId = 1,
          streamId = "deleter").isDefined)
      }
    }
    assert(out.asInstanceOf[MorApplied].stats.version == 2L)
    val t = st.read().get
    assert(t.count() == 190L)
    assert(t.filter(col("id") === 5L).select("name").as[String]
      .collect().toSeq == Seq("from_b"))
    assert(t.filter(col("id") >= 190L).isEmpty)
    assert(orphans(st).isEmpty)
  }

  test("MoR merge conflicts when deleteWhere re-masked its file, retry wins") {
    val st = seeded()
    // both hit the HIGH file: the delete changes its (name, dv) identity
    // mid-derivation; the merge's retry applies on top of the delete and
    // re-upserts the one key. Row count is the witness — a naive rebase
    // would drop the delete's 10-key mask (count 200)
    var fired = false
    val out = morHook(st, netDf(Seq((195L, "u", Some("from_b"), 200L))),
      batchId = 1, streamId = "writer_b", maxAttempts = 3) { () =>
      if (!fired) {
        fired = true
        assert(st.deleteWhere(col("id") >= 190L, batchId = 1,
          streamId = "deleter").isDefined)
      }
    }
    assert(out.asInstanceOf[MorApplied].stats.version == 2L)
    val t = st.read().get
    assert(t.count() == 191L) // 200 - 10 deleted + 1 re-upserted
    assert(t.filter(col("id") === 195L).select("name").as[String]
      .collect().toSeq == Seq("from_b"))
    assert(orphans(st).isEmpty)
  }

  test("concurrent insert into the batch's key range forces a re-derive") {
    val st = seeded()
    // A's MoR commit lands key 10000 (fresh file) while B derives an
    // update of 10000 against a parent that holds no such key: a naive
    // rebase would carry A's upsert file AND add B's — the key twice.
    // Check (c) catches it; B's retry masks A's file and supersedes it.
    var fired = false
    val out = morHook(st, netDf(Seq((10000L, "u", Some("from_b"), 200L))),
      batchId = 1, streamId = "writer_b", maxAttempts = 3) { () =>
      if (!fired) {
        fired = true
        assert(st.mergeOnRead(netDf(Seq((10000L, "c", Some("from_a"), 100L))),
          fields, batchId = 1, streamId = "writer_a").isDefined)
      }
    }
    assert(out.asInstanceOf[MorApplied].stats.version == 2L)
    val hits = st.read().get.filter(col("id") === 10000L)
      .select("name").as[String].collect().toSeq
    assert(hits == Seq("from_b"), s"expected one row, got $hits")
    assert(st.read().get.count() == 201L)
    assert(orphans(st).isEmpty)
  }

  test("replay detected during the race window: staged work is discarded") {
    val st = seeded()
    // another driver commits the SAME (batchId, streamId) while this
    // attempt is between derivation and its commit lock — the in-lock
    // replay re-check must return MorReplayed, not double-apply, and the
    // attempt's staged sidecars/upserts must be reclaimed
    var fired = false
    val out = morHook(st, netDf(Seq((5L, "u", Some("mine"), 100L))),
      batchId = 1, streamId = "shared_lineage", maxAttempts = 3) { () =>
      if (!fired) {
        fired = true
        assert(st.mergeOnRead(netDf(Seq((5L, "u", Some("theirs"), 100L))),
          fields, batchId = 1, streamId = "shared_lineage").isDefined)
      }
    }
    assert(out == MorReplayed)
    assert(st.current.get._1 == 1L) // exactly one commit landed
    assert(st.read().get.filter(col("id") === 5L).select("name")
      .as[String].collect().toSeq == Seq("theirs"))
    assert(orphans(st).isEmpty)
  }

  test("CoW merge racing a MoR commit on its touched file re-derives") {
    val st = seeded()
    // the MoR commit changes the LOW file's (name, dv) identity while a
    // CoW merge is mid-derivation on the same file: the CoW rebase check
    // (b) fails on dv identity and the retry folds the mask correctly
    var fired = false
    val out = st.mergeOptimisticHook(
      netDf(Seq((6L, "u", Some("cow"), 200L))), fields,
      batchId = 1, streamId = "cow_writer", tsGuard = true, maxAttempts = 3) {
      () =>
        if (!fired) {
          fired = true
          assert(st.mergeOnRead(netDf(Seq((5L, "d", None, 100L))),
            fields, batchId = 1, streamId = "mor_writer").isDefined)
        }
    }
    assert(out.asInstanceOf[ManifestStore.MergedAt].stats.version == 2L)
    val t = st.read().get
    assert(t.count() == 199L) // the MoR delete held through the CoW rewrite
    assert(t.filter(col("id") === 5L).isEmpty)
    assert(t.filter(col("id") === 6L).select("name").as[String]
      .collect().toSeq == Seq("cow"))
    assert(orphans(st).isEmpty)
  }

  test("genuinely concurrent MoR writers all land via rebase or retry") {
    val st = seeded()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // four writers, each superseding a key in a different range decile
    val outs = Await.result(Future.sequence(Seq(3L, 53L, 103L, 153L).map(k =>
      Future(st.mergeOnReadOptimistic(
        netDf(Seq((k, "u", Some(s"w$k"), 100L))), fields,
        batchId = 1, streamId = s"w$k", maxAttempts = 8)))), 4.minutes)
    assert(outs.forall(_.isInstanceOf[MorApplied]), outs.toString)
    assert(st.current.get._1 == 4L) // 4 commits on top of the v0 seed
    val got = st.read().get.filter(col("id").isin(3L, 53L, 103L, 153L))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(got == Map(3L -> "w3", 53L -> "w53", 103L -> "w103", 153L -> "w153"))
    assert(st.read().get.count() == 200L)
    assert(orphans(st).isEmpty)
  }

  test("cdf tables: the rebased commit's change file stays exact") {
    val st = seeded()
    st.enableChangeFeed()
    // disjoint-file rebase with capture ON: the loser's change file was
    // derived against the parent, and rebase preconditions keep it valid
    var fired = false
    val out = morHook(st, netDf(Seq((5L, "u", Some("from_b"), 100L))),
      batchId = 1, streamId = "writer_b", maxAttempts = 1) { () =>
      if (!fired) {
        fired = true
        assert(st.mergeOnRead(netDf(Seq((190L, "u", Some("from_a"), 100L))),
          fields, batchId = 1, streamId = "writer_a").isDefined)
      }
    }
    assert(out.asInstanceOf[MorApplied].stats.version == 2L)
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "2")
      .load(st.root)
    val rows = feed.select(col("id"), col("name"), col("_change_type"),
        col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(rows == Set(
      (190L, "n190", "update_preimage", 1L),
      (190L, "from_a", "update_postimage", 1L),
      (5L, "n5", "update_preimage", 2L),
      (5L, "from_b", "update_postimage", 2L)))
    assert(orphans(st).isEmpty)
  }
}
