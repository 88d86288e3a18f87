package graft.spark

import graft.SparkSpec
import graft.cdc.ManifestStore
import org.apache.spark.sql.functions._

/** Identity-partitioned tables: partition-pure file layout, partition
  * pruning through the zone map, and dynamic INSERT OVERWRITE as a
  * file-granular metadata swap ([[graft.cdc.ManifestStore.overwritePartitions]]).
  */
class GraftPartitionedSpec extends SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_part_wh_").toString

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.gpt", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpt.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpt.db")
  }
  private def sql(q: String) = { cat; spark.sql(q) }

  private def store(tbl: String) = new ManifestStore(
    java.nio.file.Paths.get(warehouse, "db", tbl).toString, spark, "id")

  private def seed(tbl: String): Unit = {
    sql(s"DROP TABLE IF EXISTS gpt.db.$tbl")
    sql(s"CREATE TABLE gpt.db.$tbl (id BIGINT, seg STRING, v DOUBLE) " +
      s"PARTITIONED BY (seg) TBLPROPERTIES ('key'='id')")
    sql(s"INSERT INTO gpt.db.$tbl " +
      "SELECT id, CASE CAST(id % 4 AS INT) WHEN 0 THEN 'A' WHEN 1 THEN 'B' " +
      "WHEN 2 THEN 'C' ELSE 'D' END, CAST(id AS DOUBLE) FROM range(0, 4000)")
  }

  test("partitioned writes produce partition-pure files; scans prune by partition") {
    seed("p1")
    val m = store("p1").currentManifest.get
    assert(m.statsCols.contains("seg"), "partition column must join the zone map")
    assert(m.files.nonEmpty)
    // purity: every file's seg zone is a single value
    assert(m.files.forall(f => f.cols.get("seg").exists { case (mn, mx) => mn == mx }),
      s"files must be partition-pure, got ${m.files.map(_.cols.get("seg"))}")
    // a partition-filtered scan plans ONLY that partition's files
    val all = spark.table("gpt.db.p1")
    val onlyA = all.filter(col("seg") === "A")
    val aFiles = m.files.count(f => f.cols("seg")._1 == "A")
    assert(onlyA.rdd.getNumPartitions === aFiles,
      "partition filter must prune the scan to the partition's files")
    assert(onlyA.count() === 1000L)
    assert(all.count() === 4000L)
  }

  test("dynamic INSERT OVERWRITE replaces only the partitions in the batch") {
    seed("p2")
    val before = store("p2").currentManifest.get
    val beforeOther = before.files.filter(f => f.cols("seg")._1 != "B")
      .map(_.name).toSet
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      sql("INSERT OVERWRITE gpt.db.p2 " +
        "SELECT id, 'B', CAST(-1.0 AS DOUBLE) FROM range(10000, 10010)")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val after = store("p2").currentManifest.get
    // untouched partitions carried BY NAME (zero I/O)
    val afterNames = after.files.map(_.name).toSet
    assert(beforeOther.subsetOf(afterNames),
      "files of untouched partitions must carry by reference")
    // the replaced partition holds exactly the new rows
    assert(spark.table("gpt.db.p2").filter(col("seg") === "B").count() === 10L)
    assert(spark.table("gpt.db.p2").filter(col("seg") === "B")
      .agg(min("id")).head().getLong(0) === 10000L)
    // other partitions intact
    assert(spark.table("gpt.db.p2").filter(col("seg") =!= "B").count() === 3000L)
    // idempotent replay: same statement, same state
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      sql("INSERT OVERWRITE gpt.db.p2 " +
        "SELECT id, 'B', CAST(-1.0 AS DOUBLE) FROM range(10000, 10010)")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert(spark.table("gpt.db.p2").count() === 3010L)
  }

  test("static INSERT OVERWRITE PARTITION (p=v): replace, and drop via empty batch") {
    seed("p3")
    // default (static) mode: the partition spec names the replaced set
    sql("INSERT OVERWRITE gpt.db.p3 PARTITION (seg = 'C') " +
      "SELECT id, CAST(-2.0 AS DOUBLE) FROM range(20000, 20005)")
    val c = spark.table("gpt.db.p3").filter(col("seg") === "C")
    assert(c.count() === 5L)
    assert(c.agg(min("id")).head().getLong(0) === 20000L)
    assert(spark.table("gpt.db.p3").filter(col("seg") =!= "C").count() === 3000L)
    // an EMPTY static batch drops the named partition outright
    sql("INSERT OVERWRITE gpt.db.p3 PARTITION (seg = 'D') " +
      "SELECT id, CAST(0.0 AS DOUBLE) FROM range(0)")
    assert(spark.table("gpt.db.p3").filter(col("seg") === "D").count() === 0L)
    assert(spark.table("gpt.db.p3").count() === 2005L) // A + B + new C
    // the store API refuses a static batch that strays outside its spec
    import spark.implicits._
    val root = java.nio.file.Paths.get(warehouse, "db", "p3").toString
    val st = new ManifestStore(root, spark, "id")
    val stray = Seq((1L, "A", 0.0)).toDF("id", "seg", "v")
    val err = intercept[IllegalArgumentException](
      st.overwritePartitions(stray, batchId = 99,
        staticValues = Some(Seq(Seq("B")))))
    assert(err.getMessage.contains("outside PARTITION"))
  }

  test("overwrite of a non-partition-pure vintage rewrites only straddlers") {
    import spark.implicits._
    // a store that predates partitioning: key-clustered files straddle
    // partition values; then the table adopts 'partitioncol'
    val root = java.nio.file.Files.createTempDirectory("part_legacy").toString
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) "old" else "new", i * 1.0)).toDF("id", "seg", "v")
    st.commit(df, batchId = 0, nFiles = 4, statsCols = Seq("seg"))
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "seg"))
    val mBefore = st.currentManifest.get
    assert(mBefore.files.exists(f =>
      f.cols("seg")._1 != f.cols("seg")._2), "vintage must straddle")
    val repl = Seq((9000L, "new", -5.0)).toDF("id", "seg", "v")
    assert(st.overwritePartitions(repl, batchId = 1).contains(1L))
    val got = st.read().get
    assert(got.filter(col("seg") === "new").count() === 1L)
    assert(got.filter(col("seg") === "old").count() === 500L)
    assert(got.count() === 501L)
    // the fresh overwrite-written file is partition-pure
    val mAfter = st.currentManifest.get
    assert(mAfter.files.exists(f =>
      f.cols.get("seg").exists { case (mn, mx) => mn == "new" && mx == "new" }))
  }

  test("multi-column PARTITIONED BY (a, b): pure cells, tuple overwrite, pruning") {
    sql("DROP TABLE IF EXISTS gpt.db.mc")
    sql("CREATE TABLE gpt.db.mc (id BIGINT, day STRING, src STRING, v DOUBLE) " +
      "PARTITIONED BY (day, src) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gpt.db.mc SELECT id, " +
      "concat('d', CAST(id % 4 AS STRING)), " +
      "CASE WHEN id % 2 = 0 THEN 'web' ELSE 'app' END, " +
      "CAST(id AS DOUBLE) FROM range(0, 4000)")
    val m = store("mc").currentManifest.get
    assert(m.statsCols.contains("day") && m.statsCols.contains("src"))
    // cell purity: every file is pure in BOTH partition columns
    Seq("day", "src").foreach(c =>
      assert(m.files.forall(f => f.cols.get(c).exists { case (mn, mx) => mn == mx }),
        s"files must be pure in '$c'"))
    // two-column predicate prunes to exactly the one cell's files
    val cell = spark.table("gpt.db.mc")
      .filter(col("day") === "d1" && col("src") === "app")
    val cellFiles = m.files.count(f =>
      f.cols("day")._1 == "d1" && f.cols("src")._1 == "app")
    assert(graft.queries.QueryUtil.plannedPartitions(cell) === cellFiles,
      "two-column partition filter must prune to the cell's files")
    assert(cell.count() === 1000L) // id%4==1 -> all odd -> all 'app'
    // dynamic overwrite of ONE (day, src) cell: every other cell's files
    // carried BY NAME — including the cross-product cells (d1, web) and
    // (d2, app), which a column-wise (not tuple-wise) classifier would
    // wrongly replace
    val beforeOthers = m.files.filterNot(f =>
      f.cols("day")._1 == "d2" && f.cols("src")._1 == "web")
      .map(_.name).toSet
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sql("INSERT OVERWRITE gpt.db.mc " +
      "SELECT id, 'd2', 'web', CAST(-1.0 AS DOUBLE) FROM range(50000, 50010)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val after = store("mc").currentManifest.get
    assert(beforeOthers.subsetOf(after.files.map(_.name).toSet),
      "all other cells' files must carry by reference")
    val t = spark.table("gpt.db.mc")
    assert(t.filter(col("day") === "d2" && col("src") === "web").count() === 10L)
    assert(t.count() === 3010L)
    assert(t.filter(col("day") === "d1").count() === 1000L)
  }

  test("partition spec evolution: old files straddle, new writes follow the new spec") {
    import spark.implicits._
    // a table partitioned by (seg) evolves to (seg, src): property change
    // only — old files keep their layout (pure in seg, straddling src),
    // stats-based pruning keeps working, and an overwrite of one
    // (seg, src) cell rewrites exactly the straddlers minus that cell
    sql("DROP TABLE IF EXISTS gpt.db.ev")
    sql("CREATE TABLE gpt.db.ev (id BIGINT, seg STRING, src STRING, v DOUBLE) " +
      "PARTITIONED BY (seg) TBLPROPERTIES ('key'='id', 'statscols'='seg,src')")
    sql("INSERT INTO gpt.db.ev SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END, " +
      "CASE WHEN id % 3 = 0 THEN 'x' ELSE 'y' END, " +
      "CAST(id AS DOUBLE) FROM range(0, 1200)")
    sql("ALTER TABLE gpt.db.ev SET TBLPROPERTIES ('partitioncol'='seg,src')")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sql("INSERT OVERWRITE gpt.db.ev " +
      "SELECT id, 'A', 'x', CAST(-7.0 AS DOUBLE) FROM range(90000, 90003)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val t = spark.table("gpt.db.ev")
    assert(t.filter(col("seg") === "A" && col("src") === "x").count() === 3L)
    // (A, y) and all of B untouched
    assert(t.filter(col("seg") === "A" && col("src") === "y").count() === 400L)
    assert(t.filter(col("seg") === "B").count() === 600L)
    // post-evolution writes are cell-pure in BOTH columns
    val m = store("ev").currentManifest.get
    val fresh = m.files.filter(f =>
      f.cols.get("seg").exists(r => r._1 == "A" && r._2 == "A") &&
        f.cols.get("src").exists(r => r._1 == "x" && r._2 == "x"))
    assert(fresh.nonEmpty, "the overwritten cell must land cell-pure")
  }

  test("overwrite keeps NULL-partition rows living in straddling files") {
    import spark.implicits._
    // nothing on the write path forbids NULL partition values; a NULL row
    // in a straddling file must survive an overwrite of OTHER partitions
    // (the remainder filter `!isin(...)` alone evaluates NULL -> dropped)
    val root = java.nio.file.Files.createTempDirectory("part_null").toString
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 100L).map(i =>
      (i, if (i % 10 == 0) null else if (i % 2 == 0) "a" else "b", i * 1.0))
      .toDF("id", "seg", "v")
    st.commit(df, batchId = 0, nFiles = 2, statsCols = Seq("seg"))
    ManifestStore.writeTableProps(root, Map("partitioncol" -> "seg"))
    val repl = Seq((9000L, "a", -1.0)).toDF("id", "seg", "v")
    assert(st.overwritePartitions(repl, batchId = 1).contains(1L))
    val got = st.read().get
    assert(got.filter(col("seg").isNull).count() === 10L,
      "NULL-partition rows must survive an overwrite of other partitions")
    assert(got.filter(col("seg") === "a").count() === 1L)
    assert(got.filter(col("seg") === "b").count() === 50L)
  }

  test("renaming the partition column keeps partitioning working") {
    seed("p5")
    sql("ALTER TABLE gpt.db.p5 RENAME COLUMN seg TO segment")
    val root = java.nio.file.Paths.get(warehouse, "db", "p5").toString
    // the table property follows the rename
    assert(ManifestStore.readTableProps(root)
      .get("partitioncol").contains("segment"))
    // pruning through the mapping: stats stay keyed by the PHYSICAL name
    val m = store("p5").currentManifest.get
    assert(m.colMap.get("segment").contains("seg"))
    val onlyB = spark.table("gpt.db.p5").filter(col("segment") === "B")
    assert(onlyB.count() === 1000L)
    assert(onlyB.rdd.getNumPartitions < m.files.size,
      "partition filter must still prune after the rename")
    // dynamic overwrite through the NEW name
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sql("INSERT OVERWRITE gpt.db.p5 " +
      "SELECT id, 'B', CAST(7.0 AS DOUBLE) FROM range(50000, 50004)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert(spark.table("gpt.db.p5").filter(col("segment") === "B")
      .count() === 4L)
    assert(spark.table("gpt.db.p5").count() === 3004L)
  }

  test("partition overwrite on a cdf table captures deletes + inserts") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("part_cdf").toString
    val st = new ManifestStore(root, spark, "id")
    st.enableChangeFeed()
    ManifestStore.writeTableProps(root,
      ManifestStore.readTableProps(root) + ("partitioncol" -> "seg"))
    st.commit((0L until 100L).map(i => (i, if (i < 50) "x" else "y", i * 1.0))
      .toDF("id", "seg", "v"), batchId = 0, nFiles = 2, statsCols = Seq("seg"))
    st.overwritePartitions(
      Seq((500L, "y", 1.0), (501L, "y", 2.0)).toDF("id", "seg", "v"),
      batchId = 1)
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load(root)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("delete" -> 50L, "insert" -> 2L))
  }
}
