package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Clustering-aware OPTIMIZE: `reclusterZorderCols` records its layout in
  * table properties (`clustering.cols` / `clustering.bits`), and
  * `optimize` on such a table folds only the DIRTY files (small ingest
  * debt + DV-heavy) into fresh z-sorted replacements, carrying every
  * clean file untouched. Without this, the key-order bin-pack is
  * catastrophic on z-ordered tables: z-files all overlap in raw key
  * space, so overlapGroups lumps the whole table into ONE group and
  * every optimize becomes a full rewrite SORTED BY KEY — shredding the
  * layout the user paid a table-scale recluster for, exactly when the
  * maintenance that is supposed to preserve table health runs
  * (including the autocompact window, which calls the same optimize).
  */
class ClusteredOptimizeSpec extends SparkSpec {
  import spark.implicits._

  // d1 uniform mod-64, d2 uniform mod-100: both dims get tight per-file
  // zone ranges after a (d1, d2) z-order
  private def seed(n: Long): DataFrame =
    (0L until n).map(i => (i, s"n$i", i % 64, i % 100))
      .toDF("id", "name", "d1", "d2")

  private val fields = Seq("id", "name", "d1", "d2")

  private def insertNet(keys: Seq[Long],
                        d2: Long => java.lang.Long): DataFrame =
    keys.map(k => (k.toString, "c", k, s"n$k", k % 64, d2(k), 99L))
      .toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name",
        "after_d1", "after_d2", Changelog.TsCol)

  test("optimize folds ingest debt z-sorted and carries the clean layout") {
    val N = 4096L
    val root = Files.createTempDirectory("zopt").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit(seed(N), batchId = 0, nFiles = 16,
      statsCols = Seq("d1", "d2"))
    assert(st.reclusterZorderCols(Seq("d1", "d2"), nFiles = 16,
      bits = 6).isDefined)
    // the recluster RECORDS its clustering for maintenance
    val props = ManifestStore.readTableProps(root)
    assert(props.get("clustering.cols").contains("d1,d2") &&
      props.get("clustering.bits").contains("6"), props.toString)
    val zNames = st.currentManifest.get.files.map(_.name).toSet
    // scattered small ingest batches — the streaming-debt shape
    (1 to 4).foreach { b =>
      val keys = (0 until 16).map(i => N + (b - 1) * 16 + i.toLong)
      st.mergeOptimistic(insertNet(keys, k => java.lang.Long.valueOf(k % 100)), fields,
        batchId = b, tsGuard = false)
    }
    val preFiles = st.currentManifest.get.files
    assert(preFiles.size > 16, s"ingest must add small files: ${preFiles.size}")

    val stats = st.optimize(targetFiles = 16).get
    val post = st.currentManifest.get
    // clean z-files carry UNTOUCHED (by name); only the debt rewrote
    val carriedZ = post.files.map(_.name).toSet.intersect(zNames)
    assert(carriedZ.size >= 14,
      s"optimize must carry the clean z-files, kept ${carriedZ.size} of 16")
    assert(stats.newFiles < 16, s"fold must be small: $stats")
    // content is exactly preserved
    assert(st.read().get.count() == N + 64)
    val got = st.read().get.filter(col("id") >= N).select("id", "d2")
      .as[(Long, Long)].collect().toMap
    assert(got == (N until N + 64).map(k => k -> k % 100).toMap)
    // the z-layout still prunes box predicates on BOTH dims
    val d1Skip = st.readWhere("d1", 10L, 15L).get._2
    assert(d1Skip.nSkipped > 0, s"d1 must still prune after optimize: $d1Skip")
    val d2Skip = st.readWhere("d2", 10L, 20L).get._2
    assert(d2Skip.nSkipped > 0, s"d2 must still prune after optimize: $d2Skip")

    // the TWIN without the recorded clustering shows the old failure:
    // the same optimize rewrites the whole table sorted by key and the
    // non-key dims stop pruning
    val rootK = Files.createTempDirectory("zoptk").toString
    val stK = new ManifestStore(rootK, spark, "id")
    stK.commit(seed(N), batchId = 0, nFiles = 16,
      statsCols = Seq("d1", "d2"))
    assert(stK.reclusterZorderCols(Seq("d1", "d2"), nFiles = 16,
      bits = 6).isDefined)
    // simulate the pre-fix world: drop the recorded clustering
    ManifestStore.writeTableProps(rootK,
      ManifestStore.readTableProps(rootK) - "clustering.cols")
    val zNamesK = stK.currentManifest.get.files.map(_.name).toSet
    (1 to 4).foreach { b =>
      val keys = (0 until 16).map(i => N + (b - 1) * 16 + i.toLong)
      stK.mergeOptimistic(insertNet(keys, k => java.lang.Long.valueOf(k % 100)), fields,
        batchId = b, tsGuard = false)
    }
    assert(stK.optimize(targetFiles = 16).isDefined)
    val carriedK = stK.currentManifest.get.files.map(_.name).toSet
      .intersect(zNamesK)
    assert(carriedK.isEmpty,
      s"key-order optimize rewrites everything on a z-table: $carriedK")
    assert(stK.readWhere("d1", 10L, 15L).get._2.nSkipped == 0,
      "key-sorted rewrite shreds the d1 zone ranges (the documented bug)")
  }

  test("an all-null clustering dim in the debt still folds (key fallback)") {
    val N = 1024L
    val root = Files.createTempDirectory("zoptn").toString
    val st = new ManifestStore(root, spark, "id")
    // nullable d2
    val df = (0L until N).map(i => (i, s"n$i", i % 64, Option(i % 100)))
      .toDF("id", "name", "d1", "d2")
    st.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("d1", "d2"))
    assert(st.reclusterZorderCols(Seq("d1", "d2"), nFiles = 8,
      bits = 5).isDefined)
    // debt whose d2 is ALL NULL: the dirty quantile pass has no mass in
    // that dim, so the fold degrades to key clustering — still a correct
    // compaction, never an abort
    (1 to 3).foreach { b =>
      val keys = (0 until 8).map(i => N + (b - 1) * 8 + i.toLong)
      st.mergeOptimistic(insertNet(keys, _ => null: java.lang.Long), fields,
        batchId = b, tsGuard = false)
    }
    val stats = st.optimize(targetFiles = 8)
    assert(stats.isDefined, "the all-null dim must not abort the fold")
    assert(st.read().get.count() == N + 24)
    assert(st.read().get.filter(col("d2").isNull).count() == 24L)
  }

  test("a missing clustering column refuses loudly, naming the fix") {
    val root = Files.createTempDirectory("zoptm").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit(seed(512L), batchId = 0, nFiles = 4, statsCols = Seq("d1"))
    ManifestStore.writeTableProps(root,
      Map("clustering.cols" -> "nope,d1"))
    (1 to 2).foreach { b =>
      val keys = (0 until 8).map(i => 512L + (b - 1) * 8 + i.toLong)
      st.mergeOptimistic(insertNet(keys, k => java.lang.Long.valueOf(k % 100)), fields,
        batchId = b, tsGuard = false)
    }
    val ex = intercept[IllegalArgumentException](st.optimize(targetFiles = 4))
    assert(ex.getMessage.contains("nope") &&
      ex.getMessage.contains("clustering.cols"), ex.getMessage)
  }

  test("composition: truncate + string z-order + clustered fold vs plain twin") {
    // the round's features stacked on the documents-table shape: truncated
    // text stats, a (lang, text-prefix) rank z-order, ingest debt, and the
    // clustered maintenance fold — every answer must equal a twin with
    // NONE of it, and the featured side must still prune text prefixes
    val N = 4000L
    def txt(i: Long) =
      f"doc-${i % 40}%03d-" + ("lorem ipsum dolor sit amet " * 8) + i
    def lang(i: Long) = Seq("en", "de", "fr", "es")(((i / 10) % 4).toInt)
    val seed = (0L until N).map(i => (i, lang(i), txt(i)))
      .toDF("id", "lang", "txt")
    def mk(featured: Boolean): (String, ManifestStore) = {
      val root = Files.createTempDirectory(s"comp$featured").toString
      if (featured)
        ManifestStore.writeTableProps(root, Map("stats.truncate" -> "12"))
      val st = new ManifestStore(root, spark, "id")
      st.commit(seed, batchId = 0, nFiles = 8, statsCols = Seq("lang", "txt"))
      if (featured)
        assert(st.reclusterZorderCols(Seq("lang", "txt"), nFiles = 8,
          bits = 5).isDefined)
      (root, st)
    }
    val (rootX, stX) = mk(featured = true)
    val (rootP, stP) = mk(featured = false)
    val flds = Seq("id", "lang", "txt")
    (1 to 3).foreach { r =>
      val batch = (0 until 16).map { i =>
        val k = N + (r - 1) * 16 + i
        (k.toString, "c", k, lang(k), txt(k), 50L + r)
      }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_lang",
        "after_txt", Changelog.TsCol)
      stX.mergeOptimistic(batch, flds, batchId = r, tsGuard = false)
      stP.mergeOptimistic(batch, flds, batchId = r, tsGuard = false)
    }
    assert(stX.optimize(targetFiles = 8).isDefined) // clustered fold
    stP.optimize(targetFiles = 8)                   // key-order pack
    val tX = spark.read.format("graft").load(rootX)
    val tP = spark.read.format("graft").load(rootP)
    assert(tX.count() === tP.count())
    // prefix answers equal; the featured side still CUTS files through
    // its truncated, fold-survived zone map ("doc-007-" is exactly the
    // 8-byte rank prefix and within the 12-byte stat budget)
    def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").as[Long].collect().toSet
    assert(idsOf(tX.filter(col("txt").startsWith("doc-007-"))) ===
      idsOf(tP.filter(col("txt").startsWith("doc-007-"))))
    val skip = stX.readWhere("txt", "doc-007-", "doc-007-\uFFFF").get._2
    assert(skip.nSkipped > 0, s"featured side must prune the prefix: $skip")
    // equality + aggregate parity (featured MIN/MAX gated onto a scan)
    assert(idsOf(tX.filter(col("lang") === "de")) ===
      idsOf(tP.filter(col("lang") === "de")))
    assert(tX.agg(min("txt"), max("txt")).head() ===
      tP.agg(min("txt"), max("txt")).head())
    // the featured manifest's text stats respect the byte budget
    stX.currentManifest.get.files.foreach { f =>
      val (mn, mx) = f.cols("txt")
      assert(mn.getBytes("UTF-8").length <= 12, s"min over budget: '$mn'")
      assert(mx.getBytes("UTF-8").length <= 16, s"max over budget: '$mx'")
    }
  }

  test("bucketed tables keep the plain path: purity beats clustering") {
    val root = Files.createTempDirectory("zoptb").toString
    ManifestStore.writeTableProps(root,
      Map("buckets" -> "4", "clustering.cols" -> "d1,d2"))
    val st = new ManifestStore(root, spark, "id")
    st.commit(seed(1024L), batchId = 0, nFiles = 4, statsCols = Seq("d1", "d2"))
    (1 to 3).foreach { b =>
      val keys = (0 until 8).map(i => 1024L + (b - 1) * 8 + i.toLong)
      st.mergeOptimistic(insertNet(keys, k => java.lang.Long.valueOf(k % 100)), fields,
        batchId = b, tsGuard = false)
    }
    assert(st.optimize(targetFiles = 4).isDefined)
    // every post-optimize file is still bucket-pure — a z-sort here would
    // have dropped the bucket ids and broken the SPJ invariant
    assert(st.currentManifest.get.files.forall(_.bucket.isDefined),
      "optimize on a bucketed table must preserve bucket purity")
    assert(st.read().get.count() == 1024L + 24L)
  }
}
