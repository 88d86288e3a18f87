package graft.cdc

import graft.SparkSpec
import graft.spark.GraftMaintenance
import org.apache.spark.sql.functions._

/** The round-13 features under combined load: a keyed MoR ingest with the
  * off-thread maintenance window (auto-compaction + retention vacuum)
  * racing it, tags set and read mid-stream, and a WAP publish attempt
  * against the moving table. Exactness of the final content is the
  * invariant — maintenance, retention, and refusals must never change an
  * answer.
  */
class MaintenanceChaosSpec extends SparkSpec {

  test("ingest + autocompact + retention + tags + publish race: content exact") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_chaos_").toString
    val root = base + "/t"
    ManifestStore.writeTableProps(root, Map(
      "autocompact.files" -> "5", "retention.versions" -> "4"))
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 200L).map(i => (i, "init")).toDF("id", "v"),
      batchId = 0, nFiles = 4)
    st.setTag("genesis", 0L)

    var publishRefusals = 0
    val stageRoot = base + "/t_wap"
    (1 to 30).foreach { e =>
      // scattered upsert: every epoch touches keys across the whole range
      val keys = (0 until 20).map(i => (i * 10 + e % 10).toLong)
      st.mergeOnReadLocked(
        keys.map(k => (k.toString, "u", e.toLong, k, s"e$e"))
          .toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
            "after_id", "after_v"),
        Seq("id", "v"), batchId = e.toLong, streamId = "chaos",
        tsGuard = false)
      GraftMaintenance.maybeSchedule(root, spark, "id")
      if (e == 10) st.cloneTo(stageRoot) // cut a WAP clone mid-stream
      if (e == 20) {
        // the table kept moving after the clone: publish MUST refuse and
        // MUST NOT change the table
        val before = st.current.get
        intercept[IllegalStateException](st.publishFrom(stageRoot))
        assert(st.current.get === before)
        publishRefusals += 1
      }
    }
    assert(GraftMaintenance.drain(), "maintenance did not drain")
    assert(publishRefusals === 1)

    // EXACT final content: key k holds the LAST epoch that wrote it
    // (epochs touch k = i*10 + e%10 for i in 0..19), others still 'init'
    val expected = (0L until 200L).map { k =>
      val lastE = (1 to 30).filter(e => k % 10 == e % 10 && k / 10 < 20)
        .lastOption
      k -> lastE.map(e => s"e$e").getOrElse("init")
    }.toMap
    val got = st.read().get.select("id", "v").as[(Long, String)]
      .collect().toMap
    assert(got.size === 200)
    expected.foreach { case (k, v) =>
      assert(got(k) === v, s"key $k: got ${got(k)}, expected $v")
    }

    // maintenance held the layout bounded and retention reaped old logs,
    // but the TAGGED version survived the vacuum window
    assert(st.currentManifest.get.files.size <= 10,
      s"autocompact never ran? ${st.currentManifest.get.files.size} files")
    assert(st.manifest(0L).isDefined, "tag must pin version 0 past retention")
    // the tag still reads version 0's exact content after 30 epochs of
    // maintenance (files untouched by reference-counted carry)
    val genesis = spark.read.format("graft")
      .option("versionAsOf", "genesis").load(root)
    assert(genesis.count() === 200L)
    assert(genesis.filter(col("v") =!= "init").count() === 0L)
  }

  test("CLUSTERED table under ingest + autocompact: content exact, layout held") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_chaos_z_").toString + "/t"
    ManifestStore.writeTableProps(root, Map("autocompact.files" -> "12"))
    val st = new ManifestStore(root, spark, "id")
    val N = 4096L
    st.commit((0L until N).map(i => (i, i % 64, i % 100))
      .toDF("id", "d1", "d2"), batchId = 0, nFiles = 8,
      statsCols = Seq("d1", "d2"))
    assert(st.reclusterZorderCols(Seq("d1", "d2"), nFiles = 8,
      bits = 5).isDefined)
    // 25 small insert epochs with the maintenance window racing: the
    // clustered fold must repay the debt WITHOUT key-sorting the table
    (1 to 25).foreach { e =>
      val keys = (0 until 8).map(i => N + (e - 1) * 8 + i.toLong)
      st.mergeOptimistic(
        keys.map(k => (k.toString, "c", e.toLong, k, k % 64, k % 100))
          .toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
            "after_id", "after_d1", "after_d2"),
        Seq("id", "d1", "d2"), batchId = e.toLong, streamId = "zchaos",
        tsGuard = false)
      GraftMaintenance.maybeSchedule(root, spark, "id")
    }
    assert(GraftMaintenance.drain(), "maintenance did not drain")
    // exact content: every seed row plus every inserted key, values intact
    val got = st.read().get.select("id", "d2").as[(Long, Long)]
      .collect().toMap
    assert(got.size.toLong === N + 200L)
    (N until N + 200L).foreach(k => assert(got(k) === k % 100, s"key $k"))
    // the window held the small-file debt bounded...
    val files = st.currentManifest.get.files.size
    assert(files <= 20, s"autocompact never folded the debt: $files files")
    // ...and the fold went through the CLUSTERED path: the z dims still
    // prune box predicates (a key-sorted rewrite would shred d2 entirely)
    val d2Skip = st.readWhere("d2", 10L, 20L).get._2
    assert(d2Skip.nSkipped > 0, s"z layout lost under maintenance: $d2Skip")
  }
}
