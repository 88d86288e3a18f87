package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Named version references (tags): set/list/delete, read resolution
  * through `versionAsOf` and SQL `VERSION AS OF`, vacuum pinning, and the
  * catalog procedures.
  */
class TagSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tag_$tag").toString + "/t"

  private def mkStore(root: String, versions: Int): ManifestStore = {
    import spark.implicits._
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 100L).map(i => (i, s"v0-$i")).toDF("id", "v"),
      batchId = 0, nFiles = 4)
    (1 until versions).foreach { ver =>
      st.mergeOptimistic(
        (0L until 10L).map(i => (s"${ver * 10 + i}", "u", ver.toLong,
          (ver * 10 + i).toLong, s"v$ver-$i"))
          .toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
            "after_id", "after_v"),
        Seq("id", "v"), batchId = ver.toLong, tsGuard = false)
    }
    st
  }

  test("setTag / tags / deleteTag round-trip; invalid inputs refuse loudly") {
    val root = tmp("rt")
    val st = mkStore(root, 3)
    st.setTag("baseline", 0L)
    st.setTag("audit-2026.08", 1L)
    assert(st.tags === Map("baseline" -> 0L, "audit-2026.08" -> 1L))
    // re-pointing an existing name is Iceberg's replace-tag
    st.setTag("baseline", 2L)
    assert(st.tags("baseline") === 2L)
    st.deleteTag("baseline")
    assert(st.tags === Map("audit-2026.08" -> 1L))
    st.deleteTag("never-existed") // idempotent
    // a bare integer would shadow the numeric versionAsOf surface
    intercept[IllegalArgumentException](st.setTag("42", 0L))
    intercept[IllegalArgumentException](st.setTag("has space", 0L))
    intercept[IllegalArgumentException](st.setTag("x", 99L)) // beyond current
  }

  test("versionAsOf resolves tag names on the batch reader") {
    val root = tmp("read")
    val st = mkStore(root, 2)
    st.setTag("pre-merge", 0L)
    val tagged = spark.read.format("graft")
      .option("versionAsOf", "pre-merge").load(root)
    assert(tagged.count() === 100L)
    assert(tagged.filter(col("v").startsWith("v1-")).count() === 0L,
      "tag 'pre-merge' must read version 0, before the merge")
    assert(spark.read.format("graft").load(root)
      .filter(col("v").startsWith("v1-")).count() === 10L)
    // unknown tags name the known ones in the error
    val err = intercept[IllegalArgumentException](spark.read.format("graft")
      .option("versionAsOf", "nope").load(root).count())
    assert(err.getMessage.contains("pre-merge"))
  }

  test("vacuum pins tagged versions; untag releases them") {
    // 12 versions: v10 is a checkpoint, so keepLast=1 reaps log entries
    // 0-9 — unless a tag pins a version's replay chain. v3 is a DELTA
    // entry whose chain runs back to checkpoint 0, the hardest case.
    val root = tmp("vac")
    val st = mkStore(root, 12)
    st.setTag("pinned", 3L)
    st.vacuum(keepLast = 1)
    assert(st.manifest(3L).isDefined,
      "the tagged version's manifest chain must survive vacuum")
    assert(st.readVersion(3L).exists(_.count() == 100L),
      "the tagged version's data files must survive vacuum")
    // an untagged version outside every pinned chain is reaped
    assert(st.manifest(7L).isEmpty,
      "vacuum must still reap untagged below-window versions")
    st.deleteTag("pinned")
    st.vacuum(keepLast = 1)
    assert(st.manifest(3L).isEmpty,
      "after untag, the version rejoins normal retention")
  }

  test("SQL surface: VERSION AS OF 'tag' and the tag/tags/untag procedures") {
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_tag_wh_").toString
    spark.conf.set("spark.sql.catalog.tgc", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tgc.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tgc.db")
    spark.sql("CREATE TABLE tgc.db.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO tgc.db.t VALUES (1, 'a'), (2, 'b')")
    val tagRow = spark.sql(
      "CALL tgc.system.tag(table => 'db.t', name => 'first-load')")
      .collect().head
    assert(tagRow.getString(0) === "first-load")
    val v = tagRow.getLong(1)
    spark.sql("INSERT INTO tgc.db.t VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM tgc.db.t").count() === 3L)
    assert(spark.sql("SELECT * FROM tgc.db.t VERSION AS OF 'first-load'")
      .count() === 2L)
    val listed = spark.sql("CALL tgc.system.tags(table => 'db.t')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(listed === Seq(("first-load", v)))
    assert(spark.sql(
      "CALL tgc.system.untag(table => 'db.t', name => 'first-load')")
      .collect().head.getBoolean(1))
    assert(spark.sql("CALL tgc.system.tags(table => 'db.t')").count() === 0L)
    intercept[Exception](spark.sql(
      "SELECT * FROM tgc.db.t VERSION AS OF 'first-load'").count())
  }
}
