package graft.spark

import graft.SparkSpec
import graft.cdc.{Changelog, ManifestStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stats-answered aggregate pushdown (`SupportsPushDownAggregates`):
  * COUNT(*) / COUNT(col) / MIN(col) / MAX(col) — plus file-granular-exact
  * filtered variants — answer from manifest metadata as a single
  * `LocalTableScan`, with NO file scan in the physical plan. Anything the
  * stats cannot answer EXACTLY falls back to the normal scan and stays
  * correct.
  */
class GraftAggPushdownSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("id", "name")

  private def netDf(rows: Seq[(Long, String, Option[String], Long)]) =
    rows.map { case (id, op, name, ts) =>
      (id, op, if (op == "d") None else Some(id), name, ts)
    }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name",
      Changelog.TsCol)
      .withColumn("after_id", col("after_id").cast("long"))

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertPushed(df: DataFrame): Unit = {
    val p = plan(df)
    assert(p.contains("LocalTableScan") && !p.contains("BatchScan"),
      s"expected a stats-answered LocalTableScan, got:\n$p")
  }

  private def assertNotPushed(df: DataFrame): Unit = {
    val p = plan(df)
    assert(p.contains("BatchScan"), s"expected a real scan, got:\n$p")
  }

  test("count/min/max answer from the manifest with no file scan") {
    val root = Files.createTempDirectory("aggp").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 400L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 8)
    val t = spark.read.format("graft").load(root)
    val q = t.agg(count(lit(1)).as("cnt"), min(col("id")).as("mn"),
      max(col("id")).as("mx"))
    assertPushed(q)
    assert(q.as[(Long, Long, Long)].head() == ((400L, 0L, 399L)))
    // count(col) of the key rides the row counts
    val qc = t.agg(count(col("id")))
    assertPushed(qc)
    assert(qc.as[Long].head() == 400L)
  }

  test("deletion vectors: count(*) stays pushed (liveRows), min/max bail") {
    val root = Files.createTempDirectory("aggp_dv").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 400L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 8)
    st.mergeOnRead(netDf(Seq((0L, "d", None, 10L), (399L, "d", None, 10L))),
      fields, batchId = 1)
    val t = spark.read.format("graft").load(root)
    val qc = t.agg(count(lit(1)).as("cnt"))
    assertPushed(qc)
    assert(qc.as[Long].head() == 398L)
    // a masked row might BE the recorded extreme — min/max must scan
    val qm = t.agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    assertNotPushed(qm)
    assert(qm.as[(Long, Long)].head() == ((1L, 398L)))
  }

  test("filtered count on partition-pure files is exact and pushed") {
    val root = Files.createTempDirectory("aggp_part").toString
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "seg"))
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 1200L).map(i =>
      (i, Seq("a", "b", "c")((i % 3L).toInt), s"n$i")).toDF("id", "seg", "name")
    st.commit(df, batchId = 0, nFiles = 6, statsCols = Seq("seg"))
    val t = spark.read.format("graft").load(root)
    val q = t.filter(col("seg") === "b").agg(count(lit(1)).as("cnt"))
    assertPushed(q)
    assert(q.as[Long].head() == 400L)
    // min/max under the exact filter also answer from the survivors' stats
    val qm = t.filter(col("seg") === "b")
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    assertPushed(qm)
    assert(qm.as[(Long, Long)].head() == ((1L, 1198L)))
  }

  test("a filter not decidable at file granularity vetoes the pushdown") {
    val root = Files.createTempDirectory("aggp_range").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 400L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 8)
    val t = spark.read.format("graft").load(root)
    // a key range cutting through the middle of a file: survivors are not
    // fully contained, so the count must come from a real scan
    val q = t.filter(col("id").between(10L, 20L)).agg(count(lit(1)).as("cnt"))
    assertNotPushed(q)
    assert(q.as[Long].head() == 11L)
    // a range that IS a union of whole files pushes (8 files over 0..399
    // cluster into 50-key ranges; >= 0 covers everything)
    val q2 = t.filter(col("id") >= 0L).agg(count(lit(1)).as("cnt"))
    assertPushed(q2)
    assert(q2.as[Long].head() == 400L)
  }

  test("null counts gate exactness: count(col) subtracts them, filters bail on nulls") {
    val root = Files.createTempDirectory("aggp_null").toString
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "seg"))
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 300L).map(i =>
      (i, if (i % 5 == 0) null else Seq("a", "b")((i % 2L).toInt), s"n$i"))
      .toDF("id", "seg", "name")
    st.commit(df, batchId = 0, nFiles = 3, statsCols = Seq("seg"))
    val t = spark.read.format("graft").load(root)
    // count(seg) = rows minus the recorded nulls, no scan
    val q = t.agg(count(col("seg")).as("cnt"))
    assertPushed(q)
    assert(q.as[Long].head() == 240L)
    // a filter on seg where surviving files CONTAIN nulls is not exact:
    // partition-pure min=max stats ignore the null rows hiding in the file
    val qf = t.filter(col("seg") === "a").agg(count(lit(1)).as("cnt"))
    assert(qf.as[Long].head() == 120L) // correct either way
  }

  test("sum and non-group-pure group-by do not push; results stay correct") {
    val root = Files.createTempDirectory("aggp_sum").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 100L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 4)
    val t = spark.read.format("graft").load(root)
    val qs = t.agg(sum(col("id")).as("s"))
    assertNotPushed(qs)
    assert(qs.as[Long].head() == 4950L)
    // 'name' is per-row distinct: files are nowhere near group-pure, so
    // the grouped pushdown refuses and the real scan answers
    val qg = t.groupBy(col("name")).agg(count(lit(1))).agg(count(lit(1)))
    assertNotPushed(qg)
  }

  test("GROUP BY a partition-pure column answers from stats, no file scan") {
    val root = Files.createTempDirectory("aggp_grp").toString
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "seg"))
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 1200L).map(i =>
      (i, Seq("a", "b", "c")((i % 3L).toInt), s"n$i")).toDF("id", "seg", "name")
    st.commit(df, batchId = 0, nFiles = 6, statsCols = Seq("seg"))
    val t = spark.read.format("graft").load(root)
    val q = t.groupBy(col("seg")).agg(count(lit(1)).as("cnt"),
      min(col("id")).as("mn"), max(col("id")).as("mx"))
    assertPushed(q)
    val got = q.orderBy("seg").as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 400L, 0L, 1197L), ("b", 400L, 1L, 1198L),
      ("c", 400L, 2L, 1199L)), s"got $got")
    // grouped + a file-granular-exact filter composes: the pruned
    // survivors regroup from their own stats
    val qf = t.filter(col("seg").isin("a", "b")).groupBy(col("seg"))
      .agg(count(lit(1)).as("cnt"))
    assertPushed(qf)
    assert(qf.orderBy("seg").as[(String, Long)].collect().toSeq ===
      Seq(("a", 400L), ("b", 400L)))
  }

  test("GROUP BY two partition columns answers from stats cell-wise") {
    val root = Files.createTempDirectory("aggp_grp2").toString
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "day,src"))
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 800L).map(i => (i,
      s"d${i % 2}", Seq("a", "b")(((i / 2) % 2L).toInt), s"n$i"))
      .toDF("id", "day", "src", "name")
    st.commit(df, batchId = 0, nFiles = 4, statsCols = Seq("day", "src"))
    val t = spark.read.format("graft").load(root)
    val q = t.groupBy(col("day"), col("src")).agg(count(lit(1)).as("cnt"))
    assertPushed(q)
    val got = q.orderBy("day", "src").as[(String, String, Long)]
      .collect().toSeq
    assert(got === Seq(("d0", "a", 200L), ("d0", "b", 200L),
      ("d1", "a", 200L), ("d1", "b", 200L)), s"got $got")
    // grouping by only ONE of the two cell columns still groups exactly
    // (each cell-pure file is also pure in each single column)
    val q1 = t.groupBy(col("src")).agg(count(lit(1)).as("cnt"))
    assertPushed(q1)
    assert(q1.orderBy("src").as[(String, Long)].collect().toSeq ===
      Seq(("a", 400L), ("b", 400L)))
  }

  test("grouped count(*) absorbs deletion vectors; grouped min/max bail") {
    val root = Files.createTempDirectory("aggp_grp_dv").toString
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "seg"))
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 600L).map(i =>
      (i, Seq("a", "b")((i % 2L).toInt), s"n$i")).toDF("id", "seg", "name")
    st.commit(df, batchId = 0, nFiles = 4, statsCols = Seq("seg"))
    // mask two even-id ('a') rows behind a deletion-vector sidecar
    st.deleteWhere(col("id").isin(0L, 2L), batchId = 1)
    val t = spark.read.format("graft").load(root)
    val qc = t.groupBy(col("seg")).agg(count(lit(1)).as("cnt"))
    assertPushed(qc)
    assert(qc.orderBy("seg").as[(String, Long)].collect().toSeq ===
      Seq(("a", 298L), ("b", 300L)))
    // a masked row might BE a group's recorded extreme
    val qm = t.groupBy(col("seg")).agg(min(col("id")).as("mn"))
    assertNotPushed(qm)
    assert(qm.orderBy("seg").as[(String, Long)].collect().toSeq ===
      Seq(("a", 4L), ("b", 1L)))
  }

  test("a fully-masked partition emits NO phantom group (MoR keeps dead files)") {
    val root = Files.createTempDirectory("aggp_dead").toString
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "seg"))
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 300L).map(i =>
      (i, Seq("a", "b", "c")((i % 3L).toInt), s"n$i")).toDF("id", "seg", "name")
    st.commit(df, batchId = 0, nFiles = 3, statsCols = Seq("seg"))
    // MoR-delete EVERY 'b' row: unlike deleteWhere, the merge-on-read
    // commit keeps the dead files in the manifest (liveRows == 0)
    val net = (0L until 300L).filter(_ % 3L == 1L)
      .map(k => (k, "d", Option.empty[Long], Option.empty[String],
        Option.empty[String], 10L))
      .toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_seg",
        "after_name", Changelog.TsCol)
    st.mergeOnRead(net, Seq("id", "seg", "name"), batchId = 1)
    assert(st.currentManifest.get.files.exists(_.liveRows == 0L),
      "premise: the MoR commit keeps fully-masked files")
    val t = spark.read.format("graft").load(root)
    val qc = t.groupBy(col("seg")).agg(count(lit(1)).as("cnt"))
    assertPushed(qc)
    // a real GROUP BY scan never emits the dead partition's group; the
    // stats answer must not invent a ('b', 0) row
    assert(qc.orderBy("seg").as[(String, Long)].collect().toSeq ===
      Seq(("a", 100L), ("c", 100L)))
  }

  test("min/max keep answering through a column rename (physical stats)") {
    val root = Files.createTempDirectory("aggp_ren").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 100L).map(i => (i, i * 2.0)).toDF("id", "v"),
      batchId = 0, nFiles = 4, statsCols = Seq("v"))
    st.renameColumn("v", "value")
    val t = spark.read.format("graft").load(root)
    val q = t.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    assertPushed(q)
    assert(q.as[(Double, Double)].head() == ((0.0, 198.0)))
  }

  test("filtered COUNT under LIKE 'prefix%' pushes when whole-file decided") {
    val root = Files.createTempDirectory("aggpfx").toString
    val st = new ManifestStore(root, spark, "id")
    // name correlates with the key, so key clustering gives each file a
    // tight name range — the layout prefix predicates are decided on
    val df = (0L until 4000L).map(i => (i, f"g${i / 500}%02d-n$i"))
      .toDF("id", "name")
    st.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("name"))
    val t = spark.read.format("graft").load(root)
    // a prefix every row matches: every candidate file is whole-file
    // decided TRUE — the count answers from stats, filter consumed
    val all = t.filter(col("name").startsWith("g")).agg(count(lit(1)))
    assertPushed(all)
    assert(all.head().getLong(0) === 4000L)
    // a prefix nothing matches: candidates prune to NOTHING — still a
    // stats answer (zero), no scan
    val none = t.filter(col("name").startsWith("zz")).agg(count(lit(1)))
    assertPushed(none)
    assert(none.head().getLong(0) === 0L)
    // a prefix whose span straddles a file boundary is NOT whole-file
    // decided: fall back to the real scan, answer stays exact
    val some = t.filter(col("name").startsWith("g03")).agg(count(lit(1)))
    assert(some.head().getLong(0) === 500L)
    // composes with truncated stats: widened bounds that still share the
    // prefix keep the proof (bounds bracket the rows)
    val rootT = Files.createTempDirectory("aggpfxt").toString
    ManifestStore.writeTableProps(rootT, Map("stats.truncate" -> "6"))
    val stT = new ManifestStore(rootT, spark, "id")
    stT.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("name"))
    val tT = spark.read.format("graft").load(rootT)
    val allT = tT.filter(col("name").startsWith("g")).agg(count(lit(1)))
    assertPushed(allT)
    assert(allT.head().getLong(0) === 4000L)
  }

  test("!= prunes single-value files; partition-excluding counts push") {
    val root = Files.createTempDirectory("aggneq").toString
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "seg"))
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 4000L).map(i => (i, f"a${i / 500}%02d"))
      .toDF("id", "seg")
    st.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("seg"))
    assert(st.currentManifest.get.files.forall(f =>
      f.cols("seg")._1 == f.cols("seg")._2), "fixture needs pure files")
    val t = spark.read.format("graft").load(root)
    // the a03 partition's files drop at PLANNING time
    val q = t.filter(col("seg") =!= "a03")
    q.collect()
    val planned = graft.queries.QueryUtil.plannedPartitions(q)
    val total = st.currentManifest.get.files.size
    assert(planned < total, s"!= must cut the a03 files: $planned of $total")
    assert(q.count() === 3500L)
    // every candidate file provably excludes the value: the filtered
    // count answers from stats with no scan
    val cnt = t.filter(col("seg") =!= "a03").agg(count(lit(1)))
    assertPushed(cnt)
    assert(cnt.head().getLong(0) === 3500L)
    // with NULLs in the column the decided proof fails (a null row does
    // not match !=): real scan, exact answer
    val rootN = Files.createTempDirectory("aggneqn").toString
    val stN = new ManifestStore(rootN, spark, "id")
    stN.commit((0L until 1000L).map(i =>
      (i, if (i % 10 == 0) None else Some(f"b${i / 250}%02d")))
      .toDF("id", "seg"), batchId = 0, nFiles = 4, statsCols = Seq("seg"))
    val tN = spark.read.format("graft").load(rootN)
    val cntN = tN.filter(col("seg") =!= "b01").agg(count(lit(1)))
    assertNotPushed(cntN)
    assert(cntN.head().getLong(0) ===
      (0L until 1000L).count(i => i % 10 != 0 && i / 250 != 1).toLong)
  }

  test("empty table: count 0, min/max null, still no scan") {
    val root = Files.createTempDirectory("aggp_empty").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit(Seq.empty[(Long, String)].toDF("id", "name"),
      batchId = 0, nFiles = 1)
    val t = spark.read.format("graft").load(root)
    val q = t.agg(count(lit(1)).as("cnt"), min(col("id")).as("mn"))
    assertPushed(q)
    val r = q.head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }
}
