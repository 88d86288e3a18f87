package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Zone-map stats on STRUCT-LEAF columns at any depth: `statsCols` may
  * name dotted paths ("meta.lang" — the multimodal/text tables' shape),
  * the stats pass folds their min/max/null counts (and KMV sketches)
  * through `ManifestStore.leafCol`, and both the store's own readWhere
  * and the DSv2 scan's pushed predicates prune files on them. Before
  * this, a filter on `meta.lang` pruned nothing even though column
  * mapping could already RENAME nested leaves.
  */
class NestedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def plannedFiles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputPartitions.size
    }.getOrElse(-1)
  }

  private def seed(root: String): ManifestStore = {
    val st = new ManifestStore(root, spark, "id")
    // meta.grp and meta.score correlate with the key, so key clustering
    // gives each file a tight range on both leaves
    val df = (0L until 4000L).map(i =>
      (i, s"g${i / 500}", i * 2,
        if (i % 4 == 0) None else Some(s"t$i"), s"body$i"))
      .toDF("id", "g", "sc", "tag", "body")
      .select(col("id"),
        struct(col("g").as("grp"), col("sc").as("score"),
          col("tag").as("tag")).as("meta"),
        col("body"))
    st.commit(df, batchId = 0, nFiles = 8,
      statsCols = Seq("meta.grp", "meta.score", "meta.tag"))
    st
  }

  test("struct-leaf statsCols fold stats and prune readWhere") {
    val root = Files.createTempDirectory("nested").toString
    val st = seed(root)
    val m = st.currentManifest.get
    assert(m.files.size == 8)
    assert(m.statsCols == Seq("meta.grp", "meta.score", "meta.tag"))
    // dotted stats recorded per file, null counts included
    m.files.foreach { f =>
      assert(f.cols.contains("meta.grp") && f.cols.contains("meta.score"),
        s"missing nested stats: ${f.cols.keySet}")
      assert(f.colNulls.get("meta.tag").exists(_ > 0L),
        "meta.tag nulls must be counted")
    }
    // range pruning on the nested numeric leaf
    val (df1, skip1) = st.readWhere("meta.score", 1000L, 1500L).get
    assert(skip1.nSkipped > 0, s"meta.score range must skip files: $skip1")
    assert(df1.select("id").as[Long].collect().toSet ==
      (500L to 750L).toSet)
    // range pruning on the nested string leaf
    val (df2, skip2) = st.readWhere("meta.grp", "g2", "g2").get
    assert(skip2.nSkipped > 0, s"meta.grp range must skip files: $skip2")
    assert(df2.count() == 500L)
    // KMV sketches cover the nested leaves too
    val ndv = st.ndvStats(m, m.files).get
    assert(ndv("meta.grp")._1 == 8L, s"meta.grp ndv=${ndv("meta.grp")._1}")
    assert(math.abs(ndv("meta.score")._1 - 4000.0) / 4000.0 < 0.27)
    assert(ndv("meta.tag")._2 == 1000L, "nested null count rides the sidecar")
  }

  test("bloomfiltercols accepts struct leaves at DDL time (write validates)") {
    // the round-13 refusal is gone: only a schema can distinguish a leaf
    // path from a top-level column literally named with a dot, so DDL
    // accepts and the WRITE validates (resolvable + zone-mapped)
    val root = Files.createTempDirectory("nestedb").toString
    ManifestStore.writeTableProps(root,
      Map("bloomfiltercols" -> "meta.grp"))
    assert(ManifestStore.readTableProps(root)("bloomfiltercols") == "meta.grp")
    // a resolvable leaf NOT in statsCols still refuses loudly at write
    val st = new ManifestStore(root, spark, "id")
    val ex = intercept[IllegalArgumentException](
      st.commit(Seq((1L, ("a", 2L))).toDF("id", "m")
        .select(col("id"), struct(col("m._1").as("grp"),
          col("m._2").as("score")).as("meta")),
        batchId = 0, nFiles = 1))
    assert(ex.getMessage.contains("zone-map column"), ex.getMessage)
  }

  test("DSv2 scan prunes files on a pushed struct-leaf predicate") {
    val root = Files.createTempDirectory("nested2").toString
    seed(root)
    val df = spark.read.format("graft").load(root)
      .filter(col("meta.score") >= 2000L && col("meta.score") < 3000L)
    val planned = plannedFiles(df)
    assert(planned >= 1 && planned <= 3,
      s"nested range should plan ~1-2 of 8 files, got $planned")
    assert(df.select("id").as[Long].collect().toSet ==
      (1000L until 1500L).toSet)

    // equality on the nested string leaf
    val eq = spark.read.format("graft").load(root)
      .filter(col("meta.grp") === "g5")
    val plannedEq = plannedFiles(eq)
    // <= 3: repartitionByRange samples boundaries, so one 500-row group
    // can straddle up to 3 of the 8 files on an unlucky sample — the gate
    // is "a small slice, not the table", not an exact file count
    assert(plannedEq >= 1 && plannedEq <= 3,
      s"nested equality should plan ~1-3 of 8 files, got $plannedEq")
    assert(eq.count() == 500L)

    // IS NULL pruning on the nested tag (null-free files drop)
    val nn = spark.read.format("graft").load(root)
      .filter(col("meta.tag").isNull && col("id") < 500L)
    assert(nn.count() == 125L)
  }

  test("promoted write folds nested-leaf stats in-task (1x-write)") {
    val warehouse = Files.createTempDirectory("nested_wh").toString
    spark.conf.set("spark.sql.catalog.gns", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gns.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gns.db")
    spark.sql("DROP TABLE IF EXISTS gns.db.t")
    spark.sql("CREATE TABLE gns.db.t " +
      "(id BIGINT, seg STRING, meta STRUCT<grp: STRING, score: BIGINT>) " +
      "PARTITIONED BY (seg) " +
      "TBLPROPERTIES ('key'='id', 'statscols'='meta.score')")
    val prevOw = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql("INSERT OVERWRITE gns.db.t SELECT id, " +
      "CASE CAST(id % 2 AS INT) WHEN 0 THEN 'A' ELSE 'B' END, " +
      "named_struct('grp', concat('g', CAST(id % 4 AS STRING)), " +
      "'score', id * 3) FROM range(0, 2000)")
    finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevOw)
    val root = java.nio.file.Paths.get(warehouse, "db", "t").toString
    val st = new ManifestStore(root, spark, "id")
    val m = st.currentManifest.get
    // the PROMOTED path ran (1x-write — nested statsCols no longer force
    // the 2x rewriting fallback), and the task-folded leaf stats are
    // bit-identical to a recompute through the store's serialization
    assert(m.streamId.startsWith("dsv2-owp1x-"),
      s"nested statsCols must promote, got '${m.streamId}'")
    assert(m.files.forall(_.cols.contains("meta.score")),
      "promoted files must carry the nested stat")
    m.files.foreach { f =>
      val real = spark.read.parquet(s"$root/files/${f.name}")
        .agg(min(col("meta.score")).cast("string"),
          max(col("meta.score")).cast("string"),
          sum(when(col("meta.score").isNull, 1L).otherwise(0L))).head()
      assert(f.cols("meta.score") ==
        ((real.getString(0), real.getString(1))),
        s"leaf stat parity: manifest ${f.cols("meta.score")} vs file " +
          s"${(real.getString(0), real.getString(1))}")
      assert(f.colNulls("meta.score") == real.getLong(2))
    }
    val (_, skip) = st.readWhere("meta.score", 0L, 300L).get
    assert(skip.nSkipped > 0)
  }
}
