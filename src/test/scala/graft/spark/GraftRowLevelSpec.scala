package graft.spark

import graft.SparkSpec

/** SQL UPDATE / MERGE INTO / subquery DELETE through Spark's delta-based
  * row-level rewrite ([[GraftRowOperation]]), against catalog-resolved
  * graft tables. Each case checks semantics AND that the store advanced by
  * a pruned merge commit (not a full rewrite).
  */
class GraftRowLevelSpec extends SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_rl_wh_").toString

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.grl", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grl.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grl.db")
  }

  private def sql(q: String) = { cat; spark.sql(q) }

  private def freshTable(name: String, n: Int = 4000, files: Int = 4): String = {
    sql(s"DROP TABLE IF EXISTS grl.db.$name")
    sql(s"CREATE TABLE grl.db.$name (id BIGINT, v STRING, amt DOUBLE) " +
      "TBLPROPERTIES ('key'='id')")
    (0 until files).foreach { i =>
      val per = n / files
      sql(s"INSERT INTO grl.db.$name SELECT id, CAST(id AS STRING), " +
        s"CAST(id AS DOUBLE) FROM range(${i * per}, ${i * per + per})")
    }
    s"grl.db.$name"
  }

  test("UPDATE rewrites only matched rows, touched files stay pruned") {
    val t = freshTable("u1")
    sql(s"UPDATE $t SET v = 'updated', amt = amt + 1000 WHERE id >= 3500")
    assert(sql(s"SELECT count(*) FROM $t WHERE v = 'updated'")
      .collect().head.getLong(0) === 500L)
    // untouched rows intact
    assert(sql(s"SELECT v, amt FROM $t WHERE id = 10").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq === Seq(("10", 10.0)))
    assert(sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 4000L)
    // expression updates flow through (amt doubled base + 1000)
    assert(sql(s"SELECT amt FROM $t WHERE id = 3999").collect()
      .head.getDouble(0) === 4999.0)
  }

  test("UPDATE with a correlated subquery condition") {
    val t = freshTable("u2", n = 1000, files = 2)
    spark.range(0, 100).selectExpr("id AS bad_id")
      .createOrReplaceTempView("bad_ids")
    sql(s"UPDATE $t SET v = 'flagged' WHERE id IN (SELECT bad_id FROM bad_ids)")
    assert(sql(s"SELECT count(*) FROM $t WHERE v = 'flagged'")
      .collect().head.getLong(0) === 100L)
  }

  test("DELETE with a subquery takes the row-level path and holds counts") {
    val t = freshTable("d1", n = 1000, files = 2)
    spark.range(0, 50).selectExpr("id AS del_id")
      .createOrReplaceTempView("del_ids")
    sql(s"DELETE FROM $t WHERE id IN (SELECT del_id FROM del_ids)")
    assert(sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 950L)
    assert(sql(s"SELECT min(id) FROM $t").collect().head.getLong(0) === 50L)
  }

  test("MERGE INTO: update matched, insert unmatched, delete on clause") {
    val t = freshTable("m1", n = 1000, files = 2)
    // source: 0..49 update, 1000..1049 insert, 50..59 delete
    spark.sql(
      """SELECT id, CONCAT('src_', id) AS v, CAST(-1.0 AS DOUBLE) AS amt,
        |       CASE WHEN id < 50 THEN 'U' WHEN id < 60 THEN 'D'
        |            ELSE 'I' END AS action
        |FROM (SELECT id FROM range(0, 60)
        |      UNION ALL SELECT id FROM range(1000, 1050))""".stripMargin)
      .createOrReplaceTempView("m1_src")
    sql(
      s"""MERGE INTO $t AS tgt USING m1_src AS src ON tgt.id = src.id
         |WHEN MATCHED AND src.action = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.v, amt = src.amt
         |WHEN NOT MATCHED AND src.action = 'I' THEN INSERT (id, v, amt) VALUES (src.id, src.v, src.amt)
         |""".stripMargin)
    assert(sql(s"SELECT count(*) FROM $t").collect().head.getLong(0)
      === 1000L - 10L + 50L)
    assert(sql(s"SELECT v FROM $t WHERE id = 25").collect()
      .head.getString(0) === "src_25")
    assert(sql(s"SELECT count(*) FROM $t WHERE id BETWEEN 50 AND 59")
      .collect().head.getLong(0) === 0L)
    assert(sql(s"SELECT v, amt FROM $t WHERE id = 1025").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq === Seq(("src_1025", -1.0)))
    // a second identical merge is idempotent: updates re-apply the same
    // values, the deleted keys stay unmatched (insert arm is action-gated),
    // and the inserts upsert onto themselves
    sql(
      s"""MERGE INTO $t AS tgt USING m1_src AS src ON tgt.id = src.id
         |WHEN MATCHED AND src.action = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.v, amt = src.amt
         |WHEN NOT MATCHED AND src.action = 'I' THEN INSERT (id, v, amt) VALUES (src.id, src.v, src.amt)
         |""".stripMargin)
    assert(sql(s"SELECT count(*) FROM $t").collect().head.getLong(0)
      === 1000L - 10L + 50L)
  }

  test("MERGE WITH SCHEMA EVOLUTION: a new source column evolves the table") {
    val t = freshTable("sev", n = 100, files = 2)
    // source carries a column the target has never seen
    spark.sql("SELECT id, CONCAT('ev_', id) AS v, " +
      "CAST(id AS DOUBLE) AS amt, CONCAT('tag', id) AS tag " +
      "FROM range(50, 120)").createOrReplaceTempView("sev_src")
    // WITHOUT the clause, the unknown column refuses (no silent evolution)
    val e = intercept[Exception](sql(
      s"""MERGE INTO $t AS tgt USING sev_src AS src ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET v = src.v, tag = src.tag
         |WHEN NOT MATCHED THEN INSERT (id, v, amt, tag)
         |VALUES (src.id, src.v, src.amt, src.tag)""".stripMargin))
    assert(e.getMessage != null)
    sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t AS tgt
         |USING sev_src AS src ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET v = src.v, tag = src.tag
         |WHEN NOT MATCHED THEN INSERT (id, v, amt, tag)
         |VALUES (src.id, src.v, src.amt, src.tag)""".stripMargin)
    // the new column landed: matched rows carry it, pre-existing
    // unmatched rows read NULL, inserts carry it
    assert(sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 120L)
    assert(sql(s"SELECT tag FROM $t WHERE id = 60").collect()
      .head.getString(0) === "tag60")
    assert(sql(s"SELECT tag FROM $t WHERE id = 110").collect()
      .head.getString(0) === "tag110")
    assert(sql(s"SELECT tag FROM $t WHERE id = 10").collect()
      .head.isNullAt(0), "pre-existing rows read NULL for the new column")
    // the evolution is a metadata commit in the table's own history
    assert(spark.table(t).schema.fieldNames.contains("tag"))
  }

  test("row-level commits are pruned merges: untouched files carry over") {
    val t = freshTable("p1", n = 4000, files = 4)
    val root = java.nio.file.Paths.get(warehouse, "db", "p1").toString
    val st = new graft.cdc.ManifestStore(root, spark, "id")
    val before = st.currentManifest.get
    // touch only the last file's key range
    sql(s"UPDATE $t SET v = 'x' WHERE id >= 3900")
    val after = st.currentManifest.get
    assert(after.version === before.version + 1)
    val beforeNames = before.files.map(_.name).toSet
    val carried = after.files.count(f => beforeNames(f.name))
    assert(carried >= 3,
      s"expected >= 3 of 4 files carried by reference, got $carried")
  }

  test("'mor' table property: scattered UPDATE masks in place, files carried") {
    cat
    sql("DROP TABLE IF EXISTS grl.db.mor1")
    sql("CREATE TABLE grl.db.mor1 (id BIGINT, v STRING, amt DOUBLE) " +
      "TBLPROPERTIES ('key'='id', 'mor'='true')")
    (0 until 4).foreach { i =>
      sql(s"INSERT INTO grl.db.mor1 SELECT id, CAST(id AS STRING), " +
        s"CAST(id AS DOUBLE) FROM range(${i * 1000}, ${i * 1000 + 1000})")
    }
    val root = java.nio.file.Paths.get(warehouse, "db", "mor1").toString
    val st = new graft.cdc.ManifestStore(root, spark, "id")
    val before = st.currentManifest.get.files.map(_.name).toSet
    // one key inside every file's range: the CoW worst case
    sql("UPDATE grl.db.mor1 SET v = 'hit' WHERE id IN (10, 1010, 2010, 3010)")
    val after = st.currentManifest.get
    // every pre-existing data file survives BY NAME (masked, not rewritten)
    assert(before.subsetOf(after.files.map(_.name).toSet),
      "mor UPDATE must not rewrite data files")
    assert(after.files.exists(_.dv.isDefined), "sidecars expected")
    assert(sql("SELECT count(*) FROM grl.db.mor1 WHERE v = 'hit'")
      .collect().head.getLong(0) === 4L)
    assert(sql("SELECT count(*) FROM grl.db.mor1").collect().head.getLong(0) === 4000L)
    // and the property round-trips through the catalog (persisted _TBLPROPS)
    assert(GraftCatalog.readProps(root).get("mor").contains("true"))
  }

  test("concurrent SQL UPDATEs on disjoint ranges both survive (CAS rebase)") {
    val t = freshTable("cc1", n = 4000, files = 4)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // two statements racing on the same table, touching different files:
    // fresh per-statement lineages mean neither can read as a replay, and
    // the store's optimistic rebase re-links the loser's rewrites
    val fa = Future(sql(s"UPDATE $t SET v = 'A' WHERE id < 500"))
    val fb = Future(sql(s"UPDATE $t SET v = 'B' WHERE id >= 3500"))
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    assert(sql(s"SELECT count(*) FROM $t WHERE v = 'A'")
      .collect().head.getLong(0) === 500L)
    assert(sql(s"SELECT count(*) FROM $t WHERE v = 'B'")
      .collect().head.getLong(0) === 500L)
    assert(sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 4000L)
  }

  test("UPDATE of the key column relocates the row") {
    val t = freshTable("k1", n = 100, files = 1)
    sql(s"UPDATE $t SET id = 100000 WHERE id = 7")
    assert(sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 100L)
    assert(sql(s"SELECT count(*) FROM $t WHERE id = 7")
      .collect().head.getLong(0) === 0L)
    assert(sql(s"SELECT v FROM $t WHERE id = 100000").collect()
      .head.getString(0) === "7")
  }

  test("key-changing UPDATE onto an OCCUPIED key collapses to one row") {
    // id=7 lives in the first file, id=1500 in the last: routing the 'u'
    // verdict by the old key alone would never prune in the colliding
    // file, leaving TWO rows with key 1500. The writer splits the verdict
    // into delete(7) + upsert(1500), so the collision resolves
    // last-write-wins like any upsert — keyed row identity holds.
    val t = freshTable("k2", n = 2000, files = 4)
    sql(s"UPDATE $t SET id = 1500 WHERE id = 7")
    assert(sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 1999L)
    assert(sql(s"SELECT count(*) FROM $t WHERE id = 7")
      .collect().head.getLong(0) === 0L)
    val winners = sql(s"SELECT v, amt FROM $t WHERE id = 1500").collect()
    assert(winners.length === 1, "duplicate key after relocating update")
    assert((winners.head.getString(0), winners.head.getDouble(1)) === (("7", 7.0)))
  }
}
