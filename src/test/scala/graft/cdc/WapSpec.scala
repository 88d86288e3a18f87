package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Write-audit-publish over zero-copy clones: cut a staging clone, write
  * and audit against it in isolation, publish the audited manifest back
  * as the table's next version — pure metadata, with loud refusals when
  * the base moved or the clone is foreign.
  */
class WapSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_wap_$tag").toString

  private def seed(root: String): ManifestStore = {
    import spark.implicits._
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 100L).map(i => (i, s"v-$i")).toDF("id", "v"),
      batchId = 0, nFiles = 4)
    st
  }

  private def mergeBatch(st: ManifestStore, tag: String, batchId: Long,
                         keys: Range): Unit = {
    import spark.implicits._
    st.mergeOptimistic(
      keys.map(i => (i.toString, "u", batchId, i.toLong, s"$tag-$i"))
        .toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
          "after_id", "after_v"),
      Seq("id", "v"), batchId = batchId, tsGuard = false)
    ()
  }

  test("clone -> audited writes -> publish: metadata-only adoption") {
    val base = tmp("pub")
    val root = base + "/t"
    val stage = base + "/t_wap"
    val st = seed(root)
    st.cloneTo(stage)
    val sg = new ManifestStore(stage, spark, "id")
    // the audit-side write: update 10 rows, insert 5 new ones
    mergeBatch(sg, "audited", 1L, 95 until 110)
    // the source is ISOLATED from staging writes until publish
    assert(st.read().get.count() === 100L)
    assert(sg.read().get.count() === 110L)
    val v = st.publishFrom(stage)
    assert(v === 1L)
    val after = st.read().get
    assert(after.count() === 110L)
    assert(after.filter(col("v") === "audited-99").count() === 1L)
    // pure metadata: the published manifest is EXACTLY the staging one
    // (same immutable file names), and every file is present in the
    // target's files/ dir (new ones hardlinked in)
    val pubNames = st.currentManifest.get.files.map(_.name).toSet
    assert(pubNames === sg.currentManifest.get.files.map(_.name).toSet)
    pubNames.foreach(n => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "files", n)), s"missing $n"))
    // the pre-publish version stays time-travel readable
    assert(st.readVersion(0L).get.count() === 100L)
    // vacuum on the published table keeps the adopted files readable
    st.vacuum(keepLast = 1)
    assert(st.read().get.count() === 110L)
  }

  test("publish refuses a moved base and a foreign clone, loudly") {
    val base = tmp("ref")
    val root = base + "/t"
    val stage = base + "/t_wap"
    val other = base + "/other"
    val st = seed(root)
    st.cloneTo(stage)
    // the table moves AFTER the clone was cut -> the audit is stale
    mergeBatch(st, "interleaved", 1L, 0 until 5)
    val err = intercept[IllegalStateException](st.publishFrom(stage))
    assert(err.getMessage.contains("moved"))
    // a clone of ANOTHER table never publishes here
    val so = seed(other)
    so.cloneTo(other + "_wap")
    intercept[IllegalArgumentException](st.publishFrom(other + "_wap"))
    // a plain table (no wap provenance) refuses too
    intercept[IllegalArgumentException](st.publishFrom(other))
  }

  test("SQL surface: CALL clone + CALL publish round-trip") {
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_wap_wh_").toString
    spark.conf.set("spark.sql.catalog.wpc", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wpc.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wpc.db")
    spark.sql("CREATE TABLE wpc.db.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO wpc.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL wpc.system.clone(source => 'db.t', target => 'db.t_wap')")
    spark.sql("INSERT INTO wpc.db.t_wap VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM wpc.db.t").count() === 2L)
    val row = spark.sql(
      "CALL wpc.system.publish(table => 'db.t', staging => 'db.t_wap')")
      .collect().head
    assert(row.getLong(0) === 2L) // v0 = CREATE, v1 = INSERT, v2 = publish
    assert(spark.sql("SELECT * FROM wpc.db.t").count() === 3L)
    assert(spark.sql("SELECT v FROM wpc.db.t WHERE id = 3").collect()
      .head.getString(0) === "c")
  }

  test("publish adopts staging schema evolution (audited ADD COLUMN)") {
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_wap_se_wh_").toString
    spark.conf.set("spark.sql.catalog.wse", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wse.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wse.db")
    spark.sql("CREATE TABLE wse.db.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO wse.db.t VALUES (1, 'a')")
    spark.sql("CALL wse.system.clone(source => 'db.t', target => 'db.t_se')")
    // the risky DDL + backfill happen on the staging table, audited there
    spark.sql("ALTER TABLE wse.db.t_se ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO wse.db.t_se VALUES (2, 'b', 0.5)")
    assert(spark.sql("DESCRIBE wse.db.t").collect()
      .count(_.getString(0) == "score") === 0,
      "the DDL must stay isolated until publish")
    spark.sql("CALL wse.system.publish(table => 'db.t', staging => 'db.t_se')")
    val rows = spark.sql(
      "SELECT id, v, score FROM wse.db.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) === 0.5)
  }
}
