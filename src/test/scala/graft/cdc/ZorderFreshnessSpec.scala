package graft.cdc

import graft.SparkSpec
import graft.spark.GraftMaintenance
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Clustered bin-boundary freshness: the incremental maintenance fold
  * ([[ManifestStore.optimize]]'s clustered branch) rank-bins over the
  * DIRTY subset only, so when ingest is skewed (the production shape — a
  * hot corner plus a scattered tail) every folded file's bins come from
  * the skewed distribution, its (x, y) hull goes table-wide, and box-prune
  * tightness decays fold after fold. The fix under test: each fold accrues
  * its output count in `clustering.foldfiles`; once the fold-written
  * fraction passes `clustering.refreshratio` the maintenance window runs a
  * FULL table-wide re-zorder (same off-thread, CAS'd discipline as
  * autocompact) and the counter resets.
  */
class ZorderFreshnessSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 4096L
  private val BaseN = 16000L

  // scattered base: x and y decorrelated from the key and each other
  private def base = (0L until BaseN).map { i =>
    (i, (i * 2654435761L) % Dim, (i * 40503L) % Dim, s"n$i")
  }.toDF("id", "x", "y", "name")

  /** One skewed ingest epoch: 80% of rows in the hot corner
    * ([0, 64)^2), 20% scattered table-wide — the mix that makes a
    * dirty-subset quantile pass allocate nearly every bin to the corner
    * and lump the scattered tail into wide-hull files.
    */
  private def epoch(e: Int, n: Long = 256L) = (0L until n).map { j =>
    val id = 1000000L + e * 100000L + j
    val (x, y) =
      if (j % 5 == 4) ((id * 2654435761L) % Dim, (id * 40503L) % Dim)
      else ((id * 7L) % 64L, (id * 11L) % 64L)
    (id.toString, "u", e.toLong, id, x, y, s"e$e-$j")
  }.toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
    "after_id", "after_x", "after_y", "after_name")

  private val fields = Seq("id", "x", "y", "name")

  /** Files the manifest pruner plans for a box probe far from the hot
    * corner — the tightness measure.
    */
  private def plannedBox(st: ManifestStore): Int = {
    val m = st.currentManifest.get
    st.prunedFiles(m, Seq(("x", ">=", 2000L), ("x", "<=", 2100L),
      ("y", ">=", 2000L), ("y", "<=", 2100L))).size
  }

  /** One TIGHT ingest epoch: every row inside the hot corner box
    * ([0, 64)^2) — a fold of these lands narrow-hull output files, so
    * measured tightness holds however often they re-fold.
    */
  private def tightEpoch(e: Int, n: Long = 256L) = (0L until n).map { j =>
    val id = 2000000L + e * 100000L + j
    (id.toString, "u", e.toLong, id, (id * 7L) % 64L, (id * 11L) % 64L,
      s"t$e-$j")
  }.toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
    "after_id", "after_x", "after_y", "after_name")

  test("same-box re-folds accrue ~zero debt: no spurious re-zorder " +
    "while measured tightness holds") {
    val root = Files.createTempDirectory("zfresh_tight").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit(base, batchId = 0, nFiles = 16, statsCols = Seq("x", "y"))
    assert(st.reclusterZorderCols(Seq("x", "y"), nFiles = 16, bits = 6)
      .isDefined)
    val tight0 = plannedBox(st)
    // trigger ARMED the whole time, at a ratio the pre-r15 COUNT gate
    // would trip well before the last cycle
    ManifestStore.writeTableProps(root,
      ManifestStore.readTableProps(root) +
        ("clustering.refreshratio" -> "0.1"))
    val rez0 = GraftMaintenance.rezorders.get()
    var batch = 1L
    (1 to 4).foreach { _ =>
      (1 to 4).foreach { _ =>
        st.mergeOnReadLocked(tightEpoch(batch.toInt), fields,
          batchId = batch, tsGuard = false)
        batch += 1
      }
      st.optimize(targetFiles = 16)
      GraftMaintenance.maybeSchedule(root, spark, "id")
      ()
    }
    assert(GraftMaintenance.drain(), "maintenance window did not drain")
    val props = ManifestStore.readTableProps(root)
    val folded = props.get("clustering.foldfiles")
      .flatMap(_.toLongOption).getOrElse(0L)
    val debt = props.get("clustering.folddebt")
      .flatMap(_.toDoubleOption).getOrElse(-1.0)
    val files = st.currentManifest.get.files.size
    assert(folded.toDouble / files >= 0.1,
      s"fixture: fold WORK must exceed the ratio in count terms " +
        s"(the pre-r15 gate would have tripped): $folded of $files")
    assert(debt >= 0.0 && debt / files < 0.1,
      s"tight same-box folds must accrue ~zero measured debt, " +
        s"got $debt over $folded fold files")
    assert(GraftMaintenance.rezorders.get() == rez0,
      "no spurious full re-zorder while measured tightness holds")
    // and tightness DID hold: the far-box probe plans no more files
    assert(plannedBox(st) <= tight0,
      s"corner-boxed folds must not widen the far-box probe: " +
        s"$tight0 -> ${plannedBox(st)}")
  }

  test("delete-heavy, drift-free: DV folds accrue ~zero debt — masked " +
    "rows never justify footprint, size-aware ideal absorbs big outputs") {
    // uniform deletes push whole z-files past dvFold; the fold merges
    // their SURVIVORS into fewer, larger z-range files. The layout never
    // drifts (deletes are uniform over the z-order), yet the pre-r16
    // span-relative measure accrued ~0.45/file here (two delete waves
    // reached debt/files 0.44 — nearly a full table rewrite for nothing).
    // The size-aware ideal (2·p^(1/dims) of live rows) absorbs the
    // legitimate footprint; measured post-fix ratio ~0.07.
    val root = Files.createTempDirectory("zfresh_dv").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit(base, batchId = 0, nFiles = 16, statsCols = Seq("x", "y"))
    assert(st.reclusterZorderCols(Seq("x", "y"), nFiles = 16, bits = 6)
      .isDefined)
    val tight0 = plannedBox(st)
    ManifestStore.writeTableProps(root,
      ManifestStore.readTableProps(root) +
        ("clustering.refreshratio" -> "0.3"))
    val rez0 = GraftMaintenance.rezorders.get()
    (1 to 4).foreach { cyc =>
      st.deleteWhere(col("id") % 10 < (cyc + 3), batchId = 1000 + cyc)
      st.optimize(targetFiles = 16)
      GraftMaintenance.maybeSchedule(root, spark, "id")
      ()
    }
    assert(GraftMaintenance.drain(), "maintenance window did not drain")
    val props = ManifestStore.readTableProps(root)
    val folded = props.get("clustering.foldfiles")
      .flatMap(_.toLongOption).getOrElse(0L)
    val debt = props.get("clustering.folddebt")
      .flatMap(_.toDoubleOption).getOrElse(-1.0)
    val files = st.currentManifest.get.files.size
    assert(folded > 0L, "fixture: the deletes must have triggered DV folds")
    assert(debt >= 0.0 && debt / files < 0.15,
      s"drift-free DV folds must accrue ~zero debt, got $debt over " +
        s"$files files ($folded fold files)")
    assert(GraftMaintenance.rezorders.get() == rez0,
      "a delete-heavy but drift-free workload must not re-zorder")
    // tightness really did hold (the claim the debt is a proxy for):
    // ABSOLUTE sanity bound, same ceiling the drift test grants a fresh
    // z-order — the probe count itself jitters 6-9 with approxQuantile
    // bin placement (a relative +2 margin tripped a full-suite run when
    // the baseline landed at 6), and the load-bearing gates here are
    // the debt ratio and the absent re-zorder above
    val boxAfter = plannedBox(st)
    assert(boxAfter >= 1 && boxAfter <= 11,
      s"uniform deletes must leave the layout clustered " +
        s"(box probe $tight0 -> $boxAfter of ${st.currentManifest.get.files.size})")
  }

  test("dead-extreme files don't defer a genuine-drift refresh: the " +
    "span denominator skips zero-live boxes") {
    // r17: the drift debt normalizes each fold file's box width by the
    // TABLE span. A fully-masked file parked at the table's extreme
    // (merge-on-read keeps zero-live entries until maintenance) used to
    // vouch for dead extent — here a [3840, 4096)^2 island 16x the live
    // range — shrinking every measured width ~16x and deferring the
    // refresh the live layout genuinely needed.
    // The shape needs SCOPED maintenance to persist: an unscoped
    // optimize classifies zero-live files dirty and folds them away, but
    // at 100 TB maintenance runs scoped to the hot range (the only
    // affordable kind) and out-of-scope dead extremes carry by reference
    // into the span fold — forever, until this fix.
    val root = Files.createTempDirectory("zfresh_dead").toString
    val st = new ManifestStore(root, spark, "id")
    // live mass confined to [0, 256)^2
    val confined = (0L until BaseN).map { i =>
      (i, (i * 2654435761L) % 256L, (i * 40503L) % 256L, s"n$i")
    }.toDF("id", "x", "y", "name")
    st.commit(confined, batchId = 0, nFiles = 16, statsCols = Seq("x", "y"))
    assert(st.reclusterZorderCols(Seq("x", "y"), nFiles = 16, bits = 6)
      .isDefined)
    // an extreme island at the far corner, appended AFTER the recluster
    // so it lands in its own files — then deleted WHOLESALE: the files
    // stay in the manifest as zero-live masked entries
    val islandNet = (0L until 512L).map { j =>
      val id = 9000000L + j
      (id.toString, "u", 1L, id, 3840L + (id * 7L) % 256L,
        3840L + (id * 11L) % 256L, s"x$j")
    }.toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
      "after_id", "after_x", "after_y", "after_name")
    st.mergeOnReadLocked(islandNet, fields, batchId = 1, tsGuard = false)
    // KEYED MoR deletes (not deleteWhere, which drops wholly-covered
    // files outright): every island key masks via DV, the file entry
    // stays at liveRows == 0 — the dead-extreme shape under test
    val islandDel = (0L until 512L).map { j =>
      val id = 9000000L + j
      (id.toString, "d", 2L, id, 0L, 0L, "")
    }.toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
      "after_id", "after_x", "after_y", "after_name")
    st.mergeOnReadLocked(islandDel, fields, batchId = 2, tsGuard = false)
    assert(st.currentManifest.get.files.exists(_.liveRows == 0L),
      s"fixture: the island delete must leave zero-live entries, got " +
        st.currentManifest.get.files
          .map(f => s"${f.liveRows}/${f.rows}").mkString(","))
    // genuine drift over the LIVE range: skewed epochs (hot corner
    // [0,64)^2 + tail scattered over the live [0,256) range only) fold
    // with dirty-subset boundaries under SCOPED optimize (x = 32 admits
    // the live-range files, never the island), exactly the decay the
    // debt measure exists to catch
    def liveEpoch(e: Int, n: Long = 256L) = (0L until n).map { j =>
      val id = 1000000L + e * 100000L + j
      val (x, y) =
        if (j % 5 == 4) ((id * 2654435761L) % 256L, (id * 40503L) % 256L)
        else ((id * 7L) % 64L, (id * 11L) % 64L)
      (id.toString, "u", e.toLong + 1L, id, x, y, s"e$e-$j")
    }.toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
      "after_id", "after_x", "after_y", "after_name")
    ManifestStore.writeTableProps(root,
      ManifestStore.readTableProps(root) +
        ("clustering.refreshratio" -> "off"))
    var batch = 3L
    (1 to 4).foreach { _ =>
      (1 to 4).foreach { _ =>
        st.mergeOnReadLocked(liveEpoch(batch.toInt), fields,
          batchId = batch, tsGuard = false)
        batch += 1
      }
      st.optimize(targetFiles = 16, scope = Seq(("x", 32L)))
      ()
    }
    // the dead island is still parked in the manifest (out of scope of
    // every fold) — the deferral shape really persisted
    assert(st.currentManifest.get.files.exists(_.liveRows == 0L),
      "fixture: scoped folds must carry the dead island untouched")
    val props = ManifestStore.readTableProps(root)
    val folded = props.get("clustering.foldfiles")
      .flatMap(_.toLongOption).getOrElse(0L)
    val debt = props.get("clustering.folddebt")
      .flatMap(_.toDoubleOption).getOrElse(-1.0)
    assert(folded > 0L, "fixture: the skewed epochs must have folded")
    // with the dead island still vouching for [0, 4096) the same drift
    // measured ~1/16th of this; the live-span measure must accrue a
    // ratio a 0.3-ish refreshratio would act on
    assert(debt / folded >= 0.2,
      s"genuine drift over the live range must accrue against the LIVE " +
        s"span, not the dead island's: debt $debt over $folded fold files")
  }

  test("pre-debt upgrade: foldfiles staleness seeds the first r15+ fold") {
    // a pre-r15 table accrued staleness only as a COUNT
    // (clustering.foldfiles); the first debt-aware fold must seed the
    // debt from that count, not 0.0, or pre-upgrade drift can never trip
    // the re-zorder it was already due for
    val root = Files.createTempDirectory("zfresh_up").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit(base, batchId = 0, nFiles = 16, statsCols = Seq("x", "y"))
    assert(st.reclusterZorderCols(Seq("x", "y"), nFiles = 16, bits = 6)
      .isDefined)
    // simulate the pre-r15 vintage: accrued count, no debt property
    ManifestStore.writeTableProps(root,
      (ManifestStore.readTableProps(root) - "clustering.folddebt") +
        ("clustering.foldfiles" -> "9") +
        ("clustering.refreshratio" -> "off"))
    var batch = 1L
    (1 to 4).foreach { _ =>
      st.mergeOnReadLocked(epoch(batch.toInt), fields, batchId = batch,
        tsGuard = false)
      batch += 1
    }
    st.optimize(targetFiles = 16)
    val debt = ManifestStore.readTableProps(root)
      .get("clustering.folddebt").flatMap(_.toDoubleOption).getOrElse(-1.0)
    assert(debt >= 9.0,
      s"the first debt-aware fold must carry the pre-upgrade count " +
        s"(9) into the seeded debt, got $debt")
  }

  test("fold drift decays tightness; the maintenance trigger restores it") {
    val root = Files.createTempDirectory("zfresh").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit(base, batchId = 0, nFiles = 16, statsCols = Seq("x", "y"))
    assert(st.reclusterZorderCols(Seq("x", "y"), nFiles = 16, bits = 6)
      .isDefined)
    val tight0 = plannedBox(st)
    // sanity floor only (16 would mean no clustering at all): the exact
    // count jitters with approxQuantile bin placement — full-suite runs
    // have measured 9 where standalone runs measure 7-8 — and the REAL
    // gates below are all relative (decay > tight0, restore < decayed)
    assert(tight0 >= 1 && tight0 <= 11,
      s"fresh z-order should bound the box probe, planned $tight0 of 16")
    assert(ManifestStore.readTableProps(root)
      .get("clustering.foldfiles").contains("0"),
      "a full re-zorder must reset the drift counter")

    // N fold cycles WITHOUT the trigger: skewed epochs land small files,
    // optimize folds them with dirty-subset boundaries
    ManifestStore.writeTableProps(root,
      ManifestStore.readTableProps(root) +
        ("clustering.refreshratio" -> "off"))
    var batch = 1L
    (1 to 4).foreach { cycle =>
      (1 to 4).foreach { _ =>
        st.mergeOnReadLocked(epoch(batch.toInt), fields, batchId = batch,
          tsGuard = false)
        batch += 1
      }
      st.optimize(targetFiles = 16)
      // the trigger is OFF: the window must not re-zorder
      GraftMaintenance.maybeSchedule(root, spark, "id")
      ()
    }
    assert(GraftMaintenance.drain(), "maintenance window did not drain")
    val props = ManifestStore.readTableProps(root)
    val folded = props.get("clustering.foldfiles")
      .flatMap(_.toLongOption).getOrElse(0L)
    assert(folded > 0L, "clustered folds must accrue the drift counter")
    val tightDecayed = plannedBox(st)
    assert(tightDecayed > tight0,
      s"skewed folds should decay box tightness: $tight0 -> $tightDecayed")
    val rezBefore = GraftMaintenance.rezorders.get()

    // same window, trigger ON past the accrued ratio: the next probe runs
    // a FULL re-zorder off-thread, resets the counter, restores tightness
    ManifestStore.writeTableProps(root,
      ManifestStore.readTableProps(root) +
        ("clustering.refreshratio" -> "0.05"))
    GraftMaintenance.maybeSchedule(root, spark, "id")
    assert(GraftMaintenance.drain(), "re-zorder window did not drain")
    assert(GraftMaintenance.rezorders.get() > rezBefore,
      "the freshness trigger must run a full re-zorder")
    assert(ManifestStore.readTableProps(root)
      .get("clustering.foldfiles").contains("0"),
      "the triggered re-zorder must reset the drift counter")
    val tightAfter = plannedBox(st)
    assert(tightAfter < tightDecayed,
      s"re-zorder must restore tightness: $tightDecayed -> $tightAfter")
    // content untouched by any of it (layout never reaches answers)
    assert(st.read().get.count() == BaseN + 16 * 256L)

    // below-threshold: a fresh probe must NOT re-zorder again
    val rezAfter = GraftMaintenance.rezorders.get()
    GraftMaintenance.maybeSchedule(root, spark, "id")
    assert(GraftMaintenance.drain())
    assert(GraftMaintenance.rezorders.get() == rezAfter,
      "a fresh table must not re-zorder")
  }
}
