package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** File-manifest store: stats-pruned MERGE (rewrite only intersecting
  * files, reuse the rest by reference), free time travel, vacuum, and
  * equivalence with the flat [[Merge.applyChanges]] semantics.
  */
class ManifestStoreSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("id", "name")

  private def store() =
    new ManifestStore(Files.createTempDirectory("mstore").toString, spark, "id")

  /** net-change rows in the flattened dedupLatest shape. */
  private def netDf(rows: Seq[(Long, String, Option[String], Long)]) =
    rows.map { case (id, op, name, ts) =>
      (id, op, if (op == "d") None else Some(id), name, ts)
    }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name",
      Changelog.TsCol)
      .withColumn("after_id", col("after_id").cast("long"))

  private def seedDf = (0L until 200L).map(i => (i, s"n$i")).toDF("id", "name")

  test("commit clusters into files with disjoint key ranges; read round-trips") {
    val st = store()
    assert(st.commit(seedDf, batchId = 0, nFiles = 8))
    val m = st.currentManifest.get
    assert(m.files.size == 8 && m.files.map(_.rows).sum == 200L)
    // tight disjoint ranges: sorted by min, each max < next min
    val sorted = m.files.sortBy(_.minKey.toLong)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a.maxKey.toLong < b.minKey.toLong })
    assert(st.read().get.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == seedDf.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // exactly-once: replaying the batch is a no-op
    assert(!st.commit(seedDf, batchId = 0, nFiles = 8))
  }

  test("merge rewrites only the files the batch's keys intersect") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    val before = st.currentManifest.get.files.map(_.name).toSet
    // keys 0-9 all land in the first 25-key file
    val net = netDf((0L until 10L).map(i => (i, "u", Some(s"upd$i"), 100L)))
    val stats = st.merge(net, fields, batchId = 1).get
    assert(stats.rewrittenFiles == 1 && stats.reusedFiles == 7)
    val after = st.currentManifest.get.files.map(_.name).toSet
    assert((before & after).size == 7) // same physical files, by reference
    // content equals the flat-merge reference on the full snapshot
    val expect = Merge.applyChanges(seedDf, net, "id", fields)
      .select("id", "name").collect().toSet
    assert(st.read().get.select("id", "name").collect().toSet == expect)
  }

  test("string-keyed table: stats, pruning, and merge run in string ordering") {
    // the hazard this gates: long-only stats cast a string key to null,
    // prune NO files, and a merge then lands the update in a growth file
    // while the stale row survives — silent duplicate keys. With typed
    // stats the same merge must rewrite exactly the hit file and keep
    // keys unique.
    val st = new ManifestStore(
      Files.createTempDirectory("mstore_s").toString, spark, "id")
    val seed = (0 until 200).map(i => (f"k$i%03d", s"n$i")).toDF("id", "name")
    assert(st.commit(seed, batchId = 0, nFiles = 8))
    val sorted = st.currentManifest.get.files.sortBy(_.minKey)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a.maxKey < b.minKey })
    val net = ((0 until 10).map(i => (f"k$i%03d", "u", f"k$i%03d", s"upd$i", 100L))
      :+ (("k150", "d", null, null, 100L)))
      .toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name",
        Changelog.TsCol)
    val stats = st.merge(net, fields, batchId = 1).get
    assert(stats.rewrittenFiles == 2 && stats.reusedFiles == 6)
    val out = st.read().get
    assert(out.count() == 199L)
    assert(out.filter(col("id") === "k005").select("name")
      .as[String].collect().toSeq == Seq("upd5"))
    assert(out.filter(col("id") === "k150").count() == 0)
    assert(out.groupBy("id").count().filter(col("count") > 1).count() == 0)
  }

  test("nested key type fails fast at commit instead of mis-pruning later") {
    val st = new ManifestStore(
      Files.createTempDirectory("mstore_bad").toString, spark, "id")
    val df = Seq((Array(1L), "x")).toDF("id", "name")
    intercept[IllegalArgumentException](st.commit(df, batchId = 0, nFiles = 1))
  }

  test("deletes rewrite their file; untouched-range inserts add one file") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    val net = netDf(Seq(
      (5L, "d", None, 100L),                    // delete inside file 0
      (10000L, "c", Some("new"), 100L)))        // insert beyond every range
    val stats = st.merge(net, fields, batchId = 1).get
    assert(stats.rewrittenFiles == 1 && stats.reusedFiles == 7)
    val out = st.read().get
    assert(out.filter(col("id") === 5L).count() == 0)
    assert(out.filter(col("id") === 10000L).select("name")
      .as[String].collect().toSeq == Seq("new"))
    assert(out.count() == 200L) // 200 - 1 delete + 1 insert
  }

  test("insert-only batch outside all ranges reuses every file") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    val net = netDf(Seq((5000L, "c", Some("a"), 10L),
      (6000L, "c", Some("b"), 10L)))
    val stats = st.merge(net, fields, batchId = 1).get
    assert(stats.rewrittenFiles == 0 && stats.reusedFiles == 8
      && stats.newFiles == 1)
    assert(st.read().get.count() == 202L)
    // replaying the merge batch is a no-op
    assert(st.merge(net, fields, batchId = 1).isEmpty)
  }

  test("ts guard holds across the pruned path") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    st.merge(netDf(Seq((7L, "u", Some("fresh"), 100L))), fields, batchId = 1)
    // stale update (ts 50 < last_ts 100) must not regress state
    st.merge(netDf(Seq((7L, "u", Some("stale"), 50L))), fields, batchId = 2)
    assert(st.read().get.filter(col("id") === 7L).select("name")
      .as[String].collect().toSeq == Seq("fresh"))
  }

  test("time travel is free until vacuum reclaims the old version's files") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    st.merge(netDf(Seq((0L, "u", Some("v1"), 100L))), fields, batchId = 1)
    // v0 still fully readable: its manifest references live files
    assert(st.readVersion(0).get.filter(col("id") === 0L).select("name")
      .as[String].collect().toSeq == Seq("n0"))
    assert(st.readVersion(1).get.filter(col("id") === 0L).select("name")
      .as[String].collect().toSeq == Seq("v1"))
    assert(st.readVersion(2).isEmpty) // beyond _CURRENT
    val removed = st.vacuum(keepLast = 1)
    assert(removed.nonEmpty) // v0's exclusive (rewritten) file reclaimed
    assert(st.readVersion(0).isEmpty) // honest None, not a mid-scan failure
    assert(st.read().get.count() == 200L) // current untouched by vacuum
  }

  test("merge on an empty-net batch reuses everything") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    val stats = st.merge(netDf(Seq.empty), fields, batchId = 1).get
    assert(stats.rewrittenFiles == 0 && stats.reusedFiles == 8)
    assert(st.read().get.count() == 200L)
  }

  test("merge-on-read masks superseded keys; zero data files rewritten") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8) // 8 files of 25
    val dataNames = st.currentManifest.get.files.map(_.name).toSet
    val net = netDf((0L until 10L).map(i => (i, "u", Some(s"upd$i"), 100L))
      ++ Seq((30L, "d", None, 100L), (10000L, "c", Some("new"), 100L)))
    val stats = st.mergeOnRead(net, fields, batchId = 1).get
    assert(stats.maskedFiles == 2 && stats.maskedRows == 11
      && stats.newFiles == 1 && stats.carriedFiles == 6)
    val m = st.currentManifest.get
    // every original data file survives BY NAME — only sidecars + one
    // upsert file were written (the O(batch) write-amplification claim)
    assert(dataNames.subsetOf(m.files.map(_.name).toSet))
    assert(m.files.count(_.dv.isDefined) == 2)
    // read path == the flat copy-on-write merge
    val expect = Merge.applyChanges(seedDf, net, "id", fields)
      .select("id", "name").collect().toSet
    assert(st.read().get.select("id", "name").collect().toSet == expect)
    assert(st.read().get.count() == 200L) // -1 delete +1 insert
    // time travel to v0 still sees the unmasked originals
    assert(st.readVersion(0L).get.count() == 200L)
    assert(st.readVersion(0L).get.filter(col("id") === 30L).count() == 1)
    // exactly-once: replaying the batch is a no-op
    assert(st.mergeOnRead(net, fields, batchId = 1).isEmpty)
  }

  test("merge-on-read honors the ts guard") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    st.mergeOnRead(netDf(Seq((7L, "u", Some("fresh"), 100L))), fields, batchId = 1)
    st.mergeOnRead(netDf(Seq((7L, "u", Some("stale"), 50L))), fields, batchId = 2)
    assert(st.read().get.filter(col("id") === 7L).select("name")
      .as[String].collect().toSeq == Seq("fresh"))
  }

  test("a second mask replaces the sidecar; vacuum reclaims the old one") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4) // files of 50
    st.mergeOnRead(netDf(Seq((1L, "u", Some("a"), 100L))), fields, batchId = 1)
    val dv1 = st.currentManifest.get.files.find(_.dv.isDefined).get.dv.get
    // second merge masks more keys in the same file AND supersedes the
    // first merge's upsert row for key 1 (which sits in the upsert file)
    st.mergeOnRead(netDf(Seq((1L, "u", Some("b"), 200L),
      (2L, "u", Some("c"), 200L))), fields, batchId = 2)
    val m = st.currentManifest.get
    val dvs = m.files.flatMap(_.dv)
    assert(!dvs.contains(dv1)) // replaced, now unreferenced by current
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(st.root, "files", dv1)))
    val got = st.read().get.filter(col("id").isin(1L, 2L))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 2L -> "c"))
    assert(st.read().get.count() == 200L)
    // keepLast=1 retains only the newest manifest: dv1 is unreferenced
    val deleted = st.vacuum(keepLast = 1)
    assert(deleted.contains(dv1))
    // current version unharmed
    assert(st.read().get.count() == 200L)
  }

  test("change feed across a merge-on-read commit carries the masked keys") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    st.mergeOnRead(netDf(Seq((3L, "u", Some("u3"), 100L),
      (60L, "d", None, 100L))), fields, batchId = 1)
    val feed = st.changesBetween(0L, 1L).get
      .select("operation", "id").as[(String, Long)].collect().toSet
    assert(feed == Set(("u", 3L), ("d", 60L)))
  }

  test("deleteWhere masks matches across files without rewriting data") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    val names0 = st.currentManifest.get.files.map(_.name).toSet
    // delete every third row: matches scatter across all 8 files
    val stats = st.deleteWhere(col("id") % 3 === 0, batchId = 1).get
    assert(stats.maskedFiles == 8 && stats.newFiles == 0)
    assert(stats.maskedRows == 67L) // ceil(200/3)
    val m = st.currentManifest.get
    assert(m.files.map(_.name).toSet == names0) // zero rewrites
    val out = st.read().get
    assert(out.count() == 133L)
    assert(out.filter(col("id") % 3 === 0).count() == 0L)
    // deleting the already-deleted commits nothing... but a fresh
    // predicate with matches does
    assert(st.deleteWhere(col("id") % 3 === 0, batchId = 2).isEmpty)
    // replay guard
    assert(st.deleteWhere(col("id") < 5, batchId = 1).isEmpty)
  }

  test("deleteWhere drops fully-emptied files from the manifest") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8) // files of 25: [0,24] first
    val stats = st.deleteWhere(col("id") < 25, batchId = 1).get
    assert(stats.maskedFiles == 1 && stats.maskedRows == 25L)
    val m = st.currentManifest.get
    assert(m.files.size == 7) // the emptied file left the manifest
    assert(m.files.forall(_.dv.isEmpty))
    assert(st.read().get.count() == 175L)
    // vacuum (keepLast=1) reclaims the dropped file and its DV + KMV
    // sidecars
    val deleted = st.vacuum(keepLast = 1)
    assert(deleted.size == 3)
    assert(st.read().get.count() == 175L)
  }

  test("optimize folds a majority-masked sidecar back into its file") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4) // files of 50
    // delete 30 of the first file's 50 keys -> dvRows*2 >= rows
    st.mergeOnRead(netDf((0L until 30L).map(i => (i, "d", None, 100L))),
      fields, batchId = 1)
    assert(st.currentManifest.get.files.exists(f => f.dvRows == 30L))
    val stats = st.optimize(4).get
    assert(stats.compactedFiles == 1 && stats.carriedFiles == 3)
    assert(st.currentManifest.get.files.forall(_.dv.isEmpty))
    assert(st.read().get.count() == 170L)
    assert(st.read().get.filter(col("id") < 30L).count() == 0)
  }

  test("optimize compacts only dirty bins; clean files carry by NAME") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4) // 4 disjoint files of 50
    // a tiny insert-only batch leaves a 2-row growth file beyond the ranges
    st.merge(netDf(Seq((500L, "c", Some("a"), 10L),
      (501L, "c", Some("b"), 10L))), fields, batchId = 1)
    val before = st.currentManifest.get.files.map(_.name).toSet
    assert(before.size == 5)
    // target 3 files -> ~67 rows/bin: the three leading 50-row files each
    // fill a bin alone (untouched), the trailing 50-row file bin-packs
    // with the 2-row growth file and only THAT pair rewrites
    val stats = st.optimize(3).get
    assert(stats.compactedFiles == 2 && stats.carriedFiles == 3
      && stats.newFiles == 1)
    val after = st.currentManifest.get.files
    // the clean files crossed by reference — same physical names
    assert((before & after.map(_.name).toSet).size == 3)
    val sorted = after.sortBy(_.minKey.toLong)
    assert(sorted.zip(sorted.tail).forall { case (a, b) =>
      a.maxKey.toLong < b.minKey.toLong })
    assert(st.read().get.count() == 202L)
    // already-clean layout: nothing to compact, no version churn
    val v = st.current.get._1
    assert(st.optimize(5).isEmpty && st.current.get._1 == v)
  }

  test("optimize clears global overlap erosion (wide growth file)") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    st.merge(netDf(Seq((5L, "u", Some("u5"), 10L),
      (10000L, "c", Some("far"), 10L))), fields, batchId = 1)
    val contentBefore = st.read().get.collect().toSet
    val stats = st.optimize(8).get
    // the [0,10000] growth span overlaps every file: all of them compact
    assert(stats.carriedFiles == 0)
    val fs = st.currentManifest.get.files.sortBy(_.minKey.toLong)
    assert(fs.zip(fs.tail).forall { case (a, b) =>
      a.maxKey.toLong < b.minKey.toLong })
    assert(st.read().get.collect().toSet == contentBefore)
  }

  test("optimize loses a CAS race cleanly instead of clobbering") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    st.merge(netDf(Seq((5L, "u", Some("u5"), 10L))), fields, batchId = 1)
    val raced = st.optimizeHook(4) { () =>
      // a writer commits between derivation and the CAS
      assert(st.merge(netDf(Seq((6L, "u", Some("u6"), 10L))), fields,
        batchId = 2).nonEmpty)
    }
    assert(raced.isEmpty)
    assert(st.read().get.filter(col("id") === 6L).select("name")
      .as[String].collect().toSeq == Seq("u6"))
    // no orphaned attempt files linger beyond the live set (sidecars
    // included: every data file now carries a .kmv)
    def names(f: ManifestStore.FileEntry): Seq[String] =
      f.name +: (f.dv.toSeq ++ f.bloom.toSeq ++ f.colBlooms.values ++ f.kmv.toSeq)
    val live = st.currentManifest.get.files.flatMap(names).toSet ++
      (0L to st.current.get._1).flatMap(v =>
        st.manifest(v).toSeq.flatMap(_.files.flatMap(names)))
    val onDisk = java.nio.file.Files.list(
      java.nio.file.Paths.get(st.root, "files"))
    try assert(onDisk.iterator().asScala.forall(p =>
      live(p.getFileName.toString)))
    finally onDisk.close()
  }

  test("recluster restores disjoint ranges after a wide growth file") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    // update key 5 + insert 10000: the touched file's rewrite clusters
    // {0..24 rows, 10000} into ONE file spanning [0, 10000] — overlapping
    // every reused file's range
    st.merge(netDf(Seq((5L, "u", Some("u5"), 10L),
      (10000L, "c", Some("far"), 10L))), fields, batchId = 1)
    def overlaps = {
      val fs = st.currentManifest.get.files.sortBy(_.minKey.toLong)
      fs.zip(fs.tail).exists { case (a, b) => a.maxKey.toLong >= b.minKey.toLong }
    }
    assert(overlaps)
    val contentBefore = st.read().get.collect().toSet
    val v = st.recluster(nFiles = 8).get
    assert(!overlaps)
    assert(st.currentManifest.get.files.size == 8)
    assert(st.read().get.collect().toSet == contentBefore)
    // maintenance, not a data change: batch 1 still registers as applied
    assert(st.current.get._1 == v && st.current.get._2 == 1L)
    assert(st.merge(netDf(Seq((5L, "u", Some("replay"), 99L))), fields,
      batchId = 1).isEmpty)
  }

  test("drift-added field evolves the schema additively across a merge") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    // net carries an after_city column the manifest schema has never seen
    val net = netDf(Seq((3L, "u", Some("u3"), 10L)))
      .withColumn("after_city", when(col(Changelog.OpCol) =!= "d", lit("ber")))
    st.merge(net, fields :+ "city", batchId = 1)
    val out = st.read().get
    assert(out.columns.contains("city"))
    // the updated row carries the new field; untouched rows (including
    // whole untouched files read through the wider schema) are null
    assert(out.filter(col("id") === 3L).select("city")
      .as[String].collect().toSeq == Seq("ber"))
    assert(out.filter(col("id") =!= 3L).filter(col("city").isNotNull).count() == 0)
  }

  test("changesBetween reads only non-shared files and matches the full diff") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    val net = netDf(Seq(
      (5L, "u", Some("u5"), 100L),       // update in file 0
      (7L, "d", None, 100L),             // delete in file 0
      (10000L, "c", Some("new"), 100L))) // insert beyond every range
    st.merge(net, fields, batchId = 1)
    val feed = st.changesBetween(0L, 1L).get
      .select("operation", "id", "before_name", "after_name").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    // exactly the three touched keys — untouched rows in rewritten files
    // and every by-reference file contribute nothing. last_ts rides along
    // (null -> set counts as a change only for rows already emitted; the
    // untouched keys kept last_ts null on both sides).
    assert(feed == Set(
      ("u", 5L, Some("n5"), Some("u5")),
      ("d", 7L, Some("n7"), None),
      ("c", 10000L, None, Some("new"))))
    // lossless vs the unrestricted full-table diff
    val full = ChangeFeed.diff(st.readVersion(0).get
      .withColumn("last_ts", lit(null).cast("long")),
      st.readVersion(1).get, "id")
      .select("operation", "id", "before_name", "after_name").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(feed == full)
    assert(st.changesBetween(0L, 5L).isEmpty) // beyond _CURRENT
  }

  test("recluster loses a CAS race cleanly instead of clobbering") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    // a writer lands an update between recluster's rewrite and its swap:
    // the stale recluster must discard its files and return None — a
    // publish would silently drop the writer's committed merge
    var fired = false
    val out = st.reclusterHook(nFiles = 8) { () =>
      if (!fired) {
        fired = true
        assert(st.merge(netDf(Seq((6L, "u", Some("u6"), 20L))), fields,
          batchId = 1).isDefined)
      }
    }
    assert(out.isEmpty)
    assert(st.read().get.filter(col("id") === 6L).select("name")
      .as[String].collect().toSeq == Seq("u6"))
    // the losing attempt's files were reclaimed: every on-disk file is
    // referenced by some retained manifest
    val referenced = (0L to st.current.get._1)
      .flatMap(st.manifest(_).toSeq.flatMap(_.files.flatMap(f =>
        f.name +: (f.dv.toSeq ++ f.bloom.toSeq ++ f.colBlooms.values ++
          f.kmv.toSeq)))).toSet
    val s = Files.list(java.nio.file.Paths.get(st.root, "files"))
    val onDisk =
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .map(_.getFileName.toString)
      finally s.close()
    assert(onDisk.forall(referenced))
    // with no interloper the retry succeeds
    assert(st.recluster(nFiles = 8).isDefined)
    assert(st.read().get.count() == 200L)
  }

  test("readWhere skips files by key stats; lookup reads only hit files") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8) // 8 files of 25, key-disjoint
    val (df, skip) = st.readWhere("id", 30L, 40L).get
    // [30,40] sits inside one 25-key file
    assert(skip.nRead == 1 && skip.nSkipped == 7 && skip.rowsRead == 25L)
    assert(df.select("id").as[Long].collect().sorted.toSeq == (30L to 40L))
    // point lookup: two keys in two different files
    val got = st.lookup(Seq(3L, 180L)).get
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(got == Map(3L -> "n3", 180L -> "n180"))
    // lookup respects deletion vectors
    st.mergeOnRead(netDf(Seq((3L, "d", None, 100L))), fields, batchId = 1)
    assert(st.lookup(Seq(3L)).get.count() == 0L)
  }

  test("statsCols zone-map a correlated column and survive a merge") {
    val st = store()
    // v = id * 2: clustering by id makes v ranges disjoint per file too
    val seed = (0L until 200L).map(i => (i, s"n$i", i * 2))
      .toDF("id", "name", "v")
    st.commit(seed, batchId = 0, nFiles = 8, statsCols = Seq("v"))
    assert(st.currentManifest.get.statsCols == Seq("v"))
    assert(st.currentManifest.get.files.forall(_.cols.contains("v")))
    val (df, skip) = st.readWhere("v", 100L, 120L).get
    assert(skip.nSkipped > 0 && skip.nRead < skip.nFiles)
    assert(df.select("v").as[Long].collect().sorted.toSeq
      == (100L to 120L by 2L))
    // a merge's rewritten + growth files keep carrying v stats
    val net = Seq((5L, "u", Some(5L), "u5", Some(10L), 100L),
      (9999L, "c", Some(9999L), "far", Some(19998L), 100L))
      .map { case (k, op, aid, an, av, ts) => (k, op, aid, an, av, ts) }
      .toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name",
        "after_v", Changelog.TsCol)
      .withColumn("after_id", col("after_id").cast("long"))
      .withColumn("after_v", col("after_v").cast("long"))
    st.merge(net, Seq("id", "name", "v"), batchId = 1)
    assert(st.currentManifest.get.statsCols == Seq("v"))
    assert(st.currentManifest.get.files.forall(_.cols.contains("v")))
    val (df2, _) = st.readWhere("v", 19998L, 19998L).get
    assert(df2.select("id").as[Long].collect().toSeq == Seq(9999L))
  }

  test("vacuum reaps manifests below the retained window") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    (1 to 3).foreach(b =>
      st.merge(netDf(Seq((b.toLong, "u", Some(s"u$b"), b * 100L))),
        fields, batchId = b))
    assert(st.current.get._1 == 3L)
    assert((0L to 3L).forall(st.readVersion(_).isDefined))
    st.vacuum(keepLast = 2)
    // versions 0-1 lose their exclusive FILES (readVersion = None), but
    // their log entries survive: 2 and 3 are DELTAS that replay from the
    // v0 checkpoint, so the chain 0..1 must outlive the data retention
    assert(st.readVersion(0L).isEmpty && st.readVersion(1L).isEmpty)
    assert(st.readVersion(2L).isDefined && st.readVersion(3L).isDefined)
    val logs = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(st.root, "_LOG"))
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    assert(logs == Set("0.json", "1.json", "2.json", "3.json"))
    // vacuum again: idempotent
    st.vacuum(keepLast = 2)
    assert(st.read().get.count() == 200L)
  }

  test("commit log entries are deltas: bytes track the batch, not the table") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    def logNode(v: Long) = {
      val p = java.nio.file.Paths.get(st.root, "_LOG", s"$v.json")
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(p))
    }
    def logBytes(v: Long) = java.nio.file.Files.size(
      java.nio.file.Paths.get(st.root, "_LOG", s"$v.json"))
    assert(logNode(0L).path("type").asText() == "checkpoint")
    // a 1-key merge rewrites 1 of 8 files: its log entry names O(changed)
    // files — 1 add + 1 remove — not the full 8-entry list
    st.merge(netDf(Seq((5L, "u", Some("x"), 100L))), fields, batchId = 1)
    val d1 = logNode(1L)
    assert(d1.path("type").asText() == "delta")
    assert(d1.path("add").size() == 1 && d1.path("remove").size() == 1)
    assert(logBytes(1L) < logBytes(0L) / 2)
    // a merge-on-read commit's sidecar change is remove+re-add by name
    st.mergeOnRead(netDf(Seq((6L, "u", Some("y"), 100L))), fields, batchId = 2)
    val d2 = logNode(2L)
    assert(d2.path("type").asText() == "delta")
    val readds = d2.path("add").elements().asScala.map(_.path("name").asText()).toSet
    val removed = d2.path("remove").elements().asScala.map(_.asText()).toSet
    assert((readds & removed).nonEmpty) // same name, new dv
    // a FRESH instance replays checkpoint+deltas to the same state
    val st2 = new ManifestStore(st.root, spark, "id")
    assert(st2.currentManifest.get == st.currentManifest.get)
    val expect = Seq(5L -> "x", 6L -> "y") ++
      (0L until 200L).filterNot(i => i == 5L || i == 6L).map(i => i -> s"n$i")
    assert(st2.read().get.select("id", "name").as[(Long, String)]
      .collect().toSet == expect.toSet)
  }

  test("every CheckpointInterval-th version writes a checkpoint; vacuum reaps below it") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    (1 to 10).foreach(b =>
      st.merge(netDf(Seq((b.toLong, "u", Some(s"u$b"), b * 100L))),
        fields, batchId = b))
    val n10 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(st.root, "_LOG", "10.json")))
    assert(n10.path("type").asText() == "checkpoint")
    // floor = 9 (delta): the chain back to the v0 checkpoint survives
    st.vacuum(keepLast = 2)
    assert(st.readVersion(9L).isDefined && st.readVersion(10L).isDefined)
    // one more commit -> floor = 10 = a checkpoint: everything below goes
    st.merge(netDf(Seq((11L, "u", Some("u11"), 1100L))), fields, batchId = 11)
    st.vacuum(keepLast = 2)
    val logs = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(st.root, "_LOG"))
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    assert(logs == Set("10.json", "11.json"))
    assert(st.readVersion(10L).isDefined && st.readVersion(11L).isDefined)
    assert(st.read().get.count() == 200L)
  }

  test("oversized deletion-vector mask set degrades to a non-broadcast join") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 8)
    st.mergeOnRead(netDf(Seq((5L, "u", Some("x"), 100L),
      (55L, "u", Some("y"), 100L))), fields, batchId = 1)
    assert(st.currentManifest.get.files.exists(_.dv.isDefined))
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      // kill every non-hint broadcast source so the plan shows the gate.
      // full read() now routes masked tables through the DSv2 connector
      // (no join at all); the gate governs the SUBSET read paths that
      // keep the anti-join — drive it through readWhere
      def viaAntiJoin() = st.readWhere("id", 0L, 999L).get._1
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.manifest.dvBroadcastMaxRows", "0")
      val gated = viaAntiJoin().queryExecution.executedPlan.toString
      assert(!gated.contains("BroadcastExchange"),
        s"mask set over the gate must not force a broadcast:\n$gated")
      spark.conf.set("spark.graft.manifest.dvBroadcastMaxRows", "1000000")
      val hinted = viaAntiJoin().queryExecution.executedPlan.toString
      assert(hinted.contains("BroadcastExchange"))
      // semantics identical on both sides of the gate, and on the
      // connector-routed full read
      spark.conf.set("spark.graft.manifest.dvBroadcastMaxRows", "0")
      assert(viaAntiJoin().filter(col("id").isin(5L, 55L))
        .select("name").as[String].collect().toSet == Set("x", "y"))
      assert(st.read().get.filter(col("id").isin(5L, 55L))
        .select("name").as[String].collect().toSet == Set("x", "y"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      prevAqe match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.conf.unset("spark.graft.manifest.dvBroadcastMaxRows")
    }
  }

  test("optimize dvFold threshold controls lone-file sidecar folding") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 1)
    // mask 25% of the single file's rows
    assert(st.deleteWhere(col("id") < 50L, batchId = 1).isDefined)
    assert(st.currentManifest.get.files.head.dvRows == 50L)
    // default threshold (half): 25% masked is not dirty — nothing commits
    assert(st.optimize(1).isEmpty)
    // a debt-repayment pass at the trigger fraction folds it
    val o = st.optimize(1, dvFold = 0.25).get
    assert(o.compactedFiles == 1)
    assert(st.currentManifest.get.files.forall(_.dv.isEmpty))
    assert(st.read().get.count() == 150L)
  }

  test("timestamp stats prune identically across session time zones") {
    import java.sql.Timestamp
    val base = 1700000000000L // fixed instant; rows 1h apart
    val rows = (0L until 96L).map(i => (i, new Timestamp(base + i * 3600000L)))
    val df = rows.toDF("id", "ts")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    val st = store()
    try {
      // write under one zone, prune under another: epoch-micros stats make
      // the manifest zone-free (a string-cast vintage would shift min/max
      // by the zone delta and mis-prune)
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      st.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("ts"))
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val lo = new Timestamp(base + 24L * 3600000L)
      val hi = new Timestamp(base + 47L * 3600000L)
      val (got, skip) = st.readWhere("ts", lo, hi).get
      assert(got.select("id").as[Long].collect().toSet == (24L until 48L).toSet)
      // and the zone map actually pruned: 2 of 8 files hold the day
      assert(skip.nSkipped == 6 && skip.nRead == 2)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("vacuum grace period protects young unreferenced files") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    st.merge(netDf(Seq((0L, "u", Some("v1"), 100L))), fields, batchId = 1)
    // a freshly staged file of an in-flight writer: unreferenced, young
    val staged = java.nio.file.Paths.get(st.root, "files", "staged.parquet")
    Files.write(staged, Array[Byte](1, 2, 3))
    assert(st.vacuum(keepLast = 1, minAgeMillis = 3600000L)
      .forall(_ != "staged.parquet"))
    assert(Files.exists(staged))
    // without the grace period it is reclaimed as an orphan
    assert(st.vacuum(keepLast = 1).contains("staged.parquet"))
    assert(!Files.exists(staged))
  }

  test("vacuum sweeps orphaned staging directories by age") {
    import java.nio.file.Paths
    import java.nio.file.attribute.FileTime
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    def stage(name: String, ageMillis: Long): java.nio.file.Path = {
      val d = Paths.get(st.root, name)
      Files.createDirectories(d)
      Files.write(d.resolve("part-0-0.parquet"), Array[Byte](1, 2, 3))
      val t = FileTime.fromMillis(System.currentTimeMillis() - ageMillis)
      Files.setLastModifiedTime(d.resolve("part-0-0.parquet"), t)
      Files.setLastModifiedTime(d, t)
      d
    }
    // a crashed SQL statement's changelog stage, two hours old
    val orphan = stage("_delta_stage_crashed", 2L * 3600000L)
    // a crashed stream's epoch stage (nested), two hours old
    val streamOrphan = stage("_stream_stage_dead/epoch-7", 2L * 3600000L)
    Files.setLastModifiedTime(streamOrphan.getParent,
      FileTime.fromMillis(System.currentTimeMillis() - 2L * 3600000L))
    // a LIVE writer's stage: just created, inside the retention headroom
    val live = stage("_stage_inflight", 0L)
    Files.setLastModifiedTime(live.resolve("part-0-0.parquet"),
      FileTime.fromMillis(System.currentTimeMillis()))
    // young vacuum: the aged orphans die, the live stage survives
    st.vacuum(keepLast = 1, minAgeMillis = 3600000L)
    assert(!Files.exists(orphan))
    assert(!Files.exists(streamOrphan.getParent))
    assert(Files.exists(live))
    // an aged vacuum reaps what is left
    st.vacuum(keepLast = 1)
    assert(!Files.exists(live))
    // the table itself is untouched throughout
    assert(st.read().get.count() == 200L)
  }

  test("replay guard catches a replayed batch behind an interleaved commit") {
    val st = store()
    st.commit(seedDf, batchId = 0, nFiles = 4)
    // stream A applies its epoch 1...
    assert(st.merge(netDf(Seq((0L, "u", Some("epochA1"), 100L))), fields,
      batchId = 1, streamId = "streamA").isDefined)
    // ...then ANOTHER writer commits on its own lineage (batch append /
    // SQL DML / second stream) before stream A's checkpoint records the
    // epoch — the latest commit is no longer stream A's
    assert(st.merge(netDf(Seq((0L, "u", Some("newer"), 200L))), fields,
      batchId = 5, streamId = "streamB", tsGuard = false).isDefined)
    // the crash-replayed epoch must be a pure no-op, not a clobber
    assert(st.replayed(1, "streamA"))
    assert(st.merge(netDf(Seq((0L, "u", Some("epochA1"), 100L))), fields,
      batchId = 1, streamId = "streamA", tsGuard = false).isEmpty)
    assert(st.mergeOptimistic(netDf(Seq((0L, "u", Some("epochA1"), 100L))),
      fields, batchId = 1, streamId = "streamA", tsGuard = false)
      == ManifestStore.AlreadyMerged)
    val got = st.read().get.filter(col("id") === 0L)
      .select("name").as[String].head()
    assert(got == "newer")
    // a genuinely new epoch on stream A still applies
    assert(st.merge(netDf(Seq((1L, "u", Some("epochA2"), 300L))), fields,
      batchId = 2, streamId = "streamA", tsGuard = false).isDefined)
  }

  test("all-rows-deleted file vanishes from the manifest") {
    val st = store()
    st.commit((0L until 8L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 4)
    // delete both keys of one 2-key file
    val net = netDf(Seq((0L, "d", None, 10L), (1L, "d", None, 10L)))
    val stats = st.merge(net, fields, batchId = 1).get
    assert(stats.rewrittenFiles == 1 && stats.newFiles == 0)
    assert(st.read().get.count() == 6L)
  }

  test("reclusterZorder: 2-D pruning appears, content survives, maintenance commit") {
    val st = store()
    // dim is UNIFORM across the key space (i % 64): key-clustered files all
    // span the full dim range, so a dim predicate prunes nothing before
    // Z-ordering. value correlates with the key (i / 64).
    val df = (0L until 4096L)
      .map(i => (i, s"n$i", i % 64, (i / 64).toDouble))
      .toDF("id", "name", "dim", "value")
    st.commit(df, batchId = 0, nFiles = 16, statsCols = Seq("dim", "value"))
    val pre = st.readWhere("dim", 10L, 15L).get._2
    assert(pre.nSkipped == 0, s"dim should not prune pre-zorder: $pre")
    val bidBefore = st.current.get._2

    assert(st.reclusterZorder("dim", "value", nFiles = 16, bits = 6).isDefined)
    val m = st.currentManifest.get
    assert(st.current.get._2 == bidBefore, "zorder must be a maintenance commit")
    assert(m.statsCols.toSet == Set("dim", "value"))

    // both dimensions now prune; content is exactly the predicate's rows
    val (dimDf, dimSkip) = st.readWhere("dim", 10L, 15L).get
    assert(dimSkip.nSkipped > 0, s"dim skip after zorder: $dimSkip")
    assert(dimDf.select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 4096L).filter(i => (10L to 15L).contains(i % 64)).toSet)
    val (_, valSkip) = st.readWhere("value", 0.0, 7.0).get
    assert(valSkip.nSkipped > 0, s"value skip after zorder: $valSkip")
    // full content identical
    assert(st.read().get.count() == 4096L)

    // keyed merge still correct on the Z-clustered layout (its pruning is
    // the documented casualty, not its semantics)
    val net = Seq((7L, "u", 7L, "zz", 7L, 0.0, 99L)).toDF(
      Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name",
      "after_dim", "after_value", Changelog.TsCol)
    st.merge(net, Seq("id", "name", "dim", "value"), batchId = 1)
    assert(st.read().get.filter(col("id") === 7L)
      .select("name").as[String].head() == "zz")
  }
}
