package graft.spark

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException

/** The catalog surface end-to-end through real SQL: DDL, DML, time travel,
  * maintenance procedures — everything a user of a metastore-registered
  * Delta table does, against `spark.sql.catalog.gct = GraftCatalog`.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_wh_").toString

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.gct", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gct.warehouse", warehouse)
  }

  private def sql(q: String) = { cat; spark.sql(q) }

  test("namespace DDL: create, list, drop") {
    sql("CREATE NAMESPACE gct.nsl")
    val shown = sql("SHOW NAMESPACES IN gct").collect().map(_.getString(0))
    assert(shown.contains("nsl") && shown.contains("default"))
    sql("DROP NAMESPACE gct.nsl")
    assert(!sql("SHOW NAMESPACES IN gct").collect().map(_.getString(0)).contains("nsl"))
  }

  test("create table, insert, select, upsert on key") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("CREATE TABLE gct.db.t (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    assert(sql("SELECT * FROM gct.db.t").count() === 0)
    sql("INSERT INTO gct.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(sql("SELECT * FROM gct.db.t").count() === 3)
    // INSERT on an existing key is a keyed UPSERT, not a duplicate append
    sql("INSERT INTO gct.db.t VALUES (2, 'B')")
    val rows = sql("SELECT v FROM gct.db.t WHERE id = 2").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("B"))
    assert(sql("SELECT * FROM gct.db.t").count() === 3)
    val tables = sql("SHOW TABLES IN gct.db").collect().map(_.getString(1))
    assert(tables.contains("t"))
  }

  test("DELETE FROM via deletion vectors; VERSION AS OF sees the past") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("CREATE TABLE gct.db.del (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.del VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    sql("DELETE FROM gct.db.del WHERE v >= 'c'")
    assert(sql("SELECT id FROM gct.db.del ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // version 1 (post-insert, pre-delete) still shows all four
    assert(sql("SELECT * FROM gct.db.del VERSION AS OF 1").count() === 4)
    // a future TIMESTAMP AS OF resolves to the current version
    assert(sql("SELECT * FROM gct.db.del TIMESTAMP AS OF '2030-01-01'").count() === 2)
    val err = intercept[Exception] {
      sql("SELECT * FROM gct.db.del TIMESTAMP AS OF '2000-01-01'").collect()
    }
    assert(err.getMessage.contains("no version"))
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; old rows read null") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("CREATE TABLE gct.db.ev (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.ev VALUES (1, 'a')")
    val filesBefore = storeFiles("db/ev")
    sql("ALTER TABLE gct.db.ev ADD COLUMN score DOUBLE")
    assert(storeFiles("db/ev") === filesBefore, "ADD COLUMN must not touch data files")
    val r = sql("SELECT id, v, score FROM gct.db.ev").collect()
    assert(r.length === 1 && r.head.isNullAt(2))
    sql("INSERT INTO gct.db.ev VALUES (2, 'b', 0.5)")
    assert(sql("SELECT score FROM gct.db.ev WHERE id = 2").collect()
      .head.getDouble(0) === 0.5)
    // a change the manifest cannot express is rejected loudly
    val err = intercept[Exception] {
      sql("ALTER TABLE gct.db.ev ALTER COLUMN score COMMENT 'x'")
    }
    assert(err.getMessage.toLowerCase.contains("does not support"))
  }

  test("RENAME COLUMN is metadata-only: mapping reads old bytes, time travel keeps old name") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.ren")
    sql("CREATE TABLE gct.db.ren (id BIGINT, v STRING, amt DOUBLE) " +
      "TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.ren VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    val filesBefore = storeFiles("db/ren")
    sql("ALTER TABLE gct.db.ren RENAME COLUMN v TO label")
    assert(storeFiles("db/ren") === filesBefore,
      "RENAME COLUMN must not touch data files")
    // old bytes answer under the new name
    assert(sql("SELECT label FROM gct.db.ren WHERE id = 1").collect()
      .head.getString(0) === "a")
    // writes through the new name land correctly and read back
    sql("INSERT INTO gct.db.ren VALUES (3, 'c', 30.0)")
    sql("UPDATE gct.db.ren SET label = 'B' WHERE id = 2")
    assert(sql("SELECT label FROM gct.db.ren ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("a", "B", "c"))
    // predicate DELETE through the renamed column (deletion-vector path)
    sql("DELETE FROM gct.db.ren WHERE label = 'B'")
    assert(sql("SELECT count(*) FROM gct.db.ren").collect().head.getLong(0) === 2L)
    // time travel to the pre-rename version still shows the OLD name
    val v1 = sql("SELECT v FROM gct.db.ren VERSION AS OF 1 WHERE id = 1")
    assert(v1.collect().head.getString(0) === "a")
    // the key column's identity is protected
    val err = intercept[Exception](
      sql("ALTER TABLE gct.db.ren RENAME COLUMN id TO id2"))
    assert(err.getMessage.contains("row identity"))
  }

  test("DROP COLUMN tombstones the physical name: re-ADD reads null, not old bytes") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.dc")
    sql("CREATE TABLE gct.db.dc (id BIGINT, v STRING, amt DOUBLE) " +
      "TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.dc VALUES (1, 'secret', 10.0)")
    val filesBefore = storeFiles("db/dc")
    sql("ALTER TABLE gct.db.dc DROP COLUMN v")
    assert(storeFiles("db/dc") === filesBefore,
      "DROP COLUMN must not touch data files")
    assert(!spark.table("gct.db.dc").columns.contains("v"))
    // time travel to the pre-drop version still shows the column
    assert(sql("SELECT v FROM gct.db.dc VERSION AS OF 1").collect()
      .head.getString(0) === "secret")
    // re-ADD the same name: old bytes must NOT resurrect
    sql("ALTER TABLE gct.db.dc ADD COLUMN v STRING")
    val r = sql("SELECT v FROM gct.db.dc WHERE id = 1").collect()
    assert(r.head.isNullAt(0),
      "re-added column must read null for pre-drop rows, not the old bytes")
    // new writes to the re-added column round-trip
    sql("INSERT INTO gct.db.dc VALUES (2, 99.0, 'fresh')")
    assert(sql("SELECT v FROM gct.db.dc WHERE id = 2").collect()
      .head.getString(0) === "fresh")
    val err = intercept[Exception](
      sql("ALTER TABLE gct.db.dc DROP COLUMN id"))
    assert(err.getMessage.contains("row identity"))
  }

  test("ALTER TABLE ADD COLUMN forces nullability: old files read NULL") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.nn")
    sql("CREATE TABLE gct.db.nn (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.nn VALUES (1, 'a')")
    // the user asks NOT NULL, but every pre-existing file reads NULL for
    // the new column — honoring it would make the schema lie about old
    // rows; the catalog forces nullable (Delta rejects such adds outright)
    sql("ALTER TABLE gct.db.nn ADD COLUMN req DOUBLE NOT NULL")
    val f = spark.table("gct.db.nn").schema("req")
    assert(f.nullable, "added column must be recorded nullable")
    val r = sql("SELECT req FROM gct.db.nn WHERE id = 1").collect()
    assert(r.length === 1 && r.head.isNullAt(0))
  }

  test("TIMESTAMP AS OF round-trips through history's commit timestamps") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.tt")
    sql("CREATE TABLE gct.db.tt (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.tt VALUES (1, 'a'), (2, 'b')")
    Thread.sleep(5L) // commit timestamps are millis; separate the versions
    sql("INSERT INTO gct.db.tt VALUES (3, 'c')")
    Thread.sleep(5L)
    sql("DELETE FROM gct.db.tt WHERE id = 1")
    // history: newest first — (version, batch_id, stream_id, ts_millis, ...)
    val hist = sql("CALL gct.system.history(table => 'db.tt')").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    def tsOf(v: Long): String =
      java.time.Instant.ofEpochMilli(hist(v)).toString
    // each version's own commit instant resolves to exactly that version
    assert(sql(s"SELECT * FROM gct.db.tt TIMESTAMP AS OF '${tsOf(1L)}'")
      .count() === 2) // post first insert
    assert(sql(s"SELECT * FROM gct.db.tt TIMESTAMP AS OF '${tsOf(2L)}'")
      .count() === 3) // post second insert, pre delete
    assert(sql(s"SELECT * FROM gct.db.tt TIMESTAMP AS OF '${tsOf(3L)}'")
      .count() === 2) // post delete = current
  }

  test("rename and drop table") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("CREATE TABLE gct.db.r1 (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.r1 VALUES (1, 'a')")
    sql("ALTER TABLE gct.db.r1 RENAME TO db.r2")
    assert(sql("SELECT * FROM gct.db.r2").count() === 1)
    assert(intercept[AnalysisException](
      sql("SELECT * FROM gct.db.r1").collect()) != null)
    sql("DROP TABLE gct.db.r2")
    assert(!sql("SHOW TABLES IN gct.db").collect().map(_.getString(1)).contains("r2"))
  }

  test("CREATE TABLE validation: key property and partition transforms") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    val e1 = intercept[Exception](
      sql("CREATE TABLE gct.db.nokey (id BIGINT, v STRING)"))
    assert(e1.getMessage.contains("key"))
    // bucket transforms must target the KEY column (that is what aligns
    // storage-partitioned joins); any other column is refused
    val e2 = intercept[Exception](sql(
      "CREATE TABLE gct.db.partb (id BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, v)) TBLPROPERTIES ('key'='id')"))
    assert(e2.getMessage.contains("key column"))
    // other derived transforms (days/years/truncate) are not supported
    val e3 = intercept[Exception](sql(
      "CREATE TABLE gct.db.part2 (id BIGINT, v STRING, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts)) TBLPROPERTIES ('key'='id')"))
    assert(e3.getMessage.toLowerCase.contains("partition"))
    // multi-column identity partitioning IS supported (round 11)
    sql("DROP TABLE IF EXISTS gct.db.partmc")
    sql("CREATE TABLE gct.db.partmc (id BIGINT, v STRING, w STRING) " +
      "PARTITIONED BY (v, w) TBLPROPERTIES ('key'='id')")
    assert(graft.cdc.ManifestStore.readTableProps(
      java.nio.file.Paths.get(warehouse, "db", "partmc").toString)
      .get("partitioncol").contains("v,w"))
  }

  test("nested column mapping: struct-leaf RENAME/DROP are metadata commits") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.nst")
    sql("CREATE TABLE gct.db.nst (id BIGINT, meta STRUCT<a: DOUBLE, b: STRING>) " +
      "TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.nst SELECT id, " +
      "named_struct('a', CAST(id AS DOUBLE), 'b', concat('v', id)) " +
      "FROM range(0, 100)")
    val root = java.nio.file.Paths.get(warehouse, "db", "nst").toString
    val st = new graft.cdc.ManifestStore(root, spark, "id")
    val filesBefore = st.currentManifest.get.files.map(_.name).toSet
    // RENAME of a struct leaf: pure metadata, pre-DDL files read back
    sql("ALTER TABLE gct.db.nst RENAME COLUMN meta.a TO alpha")
    assert(st.currentManifest.get.files.map(_.name).toSet === filesBefore,
      "nested RENAME must not touch data files")
    assert(st.currentManifest.get.colMap.get("meta.alpha").contains("a"))
    val r = sql("SELECT id, meta.alpha FROM gct.db.nst WHERE id = 7")
      .collect().head
    assert(r.getDouble(1) === 7.0, "pre-DDL bytes must read under the new name")
    // writes after the rename physicalize the leaf back to 'a'
    sql("INSERT INTO gct.db.nst SELECT id, " +
      "named_struct('alpha', CAST(-1.0 AS DOUBLE), 'b', 'new') " +
      "FROM range(1000, 1003)")
    assert(sql("SELECT meta.alpha FROM gct.db.nst WHERE id = 1000")
      .collect().head.getDouble(0) === -1.0)
    assert(sql("SELECT count(*) AS c FROM gct.db.nst").collect()
      .head.getLong(0) === 103L)
    // DROP of a struct leaf: metadata-only, tombstoned under the parent
    val filesBeforeDrop = st.currentManifest.get.files.map(_.name).toSet
    sql("ALTER TABLE gct.db.nst DROP COLUMN meta.b")
    assert(st.currentManifest.get.files.map(_.name).toSet === filesBeforeDrop,
      "nested DROP must not touch data files")
    assert(st.currentManifest.get.droppedPhys.contains("meta.b"))
    val fields = spark.table("gct.db.nst").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(fields === Seq("alpha"), s"got $fields")
    assert(sql("SELECT sum(meta.alpha) AS s FROM gct.db.nst").collect()
      .head.getDouble(0) === (0 until 100).map(_.toDouble).sum - 3.0)
    // renaming the PARENT keeps the leaf mapping attached
    sql("ALTER TABLE gct.db.nst RENAME COLUMN meta TO info")
    assert(st.currentManifest.get.colMap.get("info.alpha").contains("a"))
    assert(sql("SELECT info.alpha FROM gct.db.nst WHERE id = 7")
      .collect().head.getDouble(0) === 7.0)
    // time travel still shows the pre-DDL shape
    assert(spark.read.format("graft").option("versionAsOf", "1").load(root)
      .select("meta.a").count() === 100L)
  }

  test("nested column mapping beyond one level: deep RENAME/DROP, " +
      "map/array paths refused") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.deep")
    sql("CREATE TABLE gct.db.deep (id BIGINT, " +
      "outer STRUCT<mid: STRUCT<x: DOUBLE, y: STRING>, z: BIGINT>, " +
      "tags MAP<STRING, STRING>, arr ARRAY<STRUCT<q: DOUBLE>>) " +
      "TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.deep SELECT id, " +
      "named_struct('mid', named_struct('x', CAST(id AS DOUBLE), " +
      "'y', concat('y', id)), 'z', id * 10), " +
      "map('k', 'v'), array(named_struct('q', CAST(id AS DOUBLE))) " +
      "FROM range(0, 50)")
    val root = java.nio.file.Paths.get(warehouse, "db", "deep").toString
    val st = new graft.cdc.ManifestStore(root, spark, "id")
    val filesBefore = st.currentManifest.get.files.map(_.name).toSet
    // RENAME two levels down: pure metadata, pre-DDL bytes read back
    sql("ALTER TABLE gct.db.deep RENAME COLUMN outer.mid.x TO ex")
    assert(st.currentManifest.get.files.map(_.name).toSet === filesBefore,
      "deep RENAME must not touch data files")
    assert(st.currentManifest.get.colMap.get("outer.mid.ex").contains("x"))
    assert(sql("SELECT outer.mid.ex FROM gct.db.deep WHERE id = 7")
      .collect().head.getDouble(0) === 7.0)
    // writes after the deep rename physicalize back to 'x'
    sql("INSERT INTO gct.db.deep SELECT id, " +
      "named_struct('mid', named_struct('ex', CAST(-1.0 AS DOUBLE), " +
      "'y', 'n'), 'z', CAST(0 AS BIGINT)), map('k','v'), " +
      "array(named_struct('q', CAST(0.0 AS DOUBLE))) FROM range(500, 502)")
    assert(sql("SELECT outer.mid.ex FROM gct.db.deep WHERE id = 500")
      .collect().head.getDouble(0) === -1.0)
    assert(sql("SELECT count(*) FROM gct.db.deep").collect()
      .head.getLong(0) === 52L)
    // renaming a MID-LEVEL struct carries its children's mappings along
    sql("ALTER TABLE gct.db.deep RENAME COLUMN outer.mid TO core")
    assert(st.currentManifest.get.colMap.get("outer.core.ex").contains("x"))
    assert(st.currentManifest.get.colMap.get("outer.core").contains("mid"))
    assert(sql("SELECT outer.core.ex FROM gct.db.deep WHERE id = 7")
      .collect().head.getDouble(0) === 7.0)
    // DROP two levels down: metadata-only, tombstoned at its full path
    val beforeDrop = st.currentManifest.get.files.map(_.name).toSet
    sql("ALTER TABLE gct.db.deep DROP COLUMN outer.core.y")
    assert(st.currentManifest.get.files.map(_.name).toSet === beforeDrop)
    assert(sql("SELECT outer.core.ex FROM gct.db.deep WHERE id = 7")
      .collect().head.getDouble(0) === 7.0)
    // refusal ONLY for map/array element paths
    val e1 = intercept[Exception](
      sql("ALTER TABLE gct.db.deep RENAME COLUMN arr.element.q TO p"))
    assert(e1.getMessage.contains("map/array") ||
      e1.getMessage.toLowerCase.contains("not a struct"), e1.getMessage)
    // and the pre-DDL shape still time-travels
    assert(spark.read.format("graft").option("versionAsOf", "1").load(root)
      .select("outer.mid.x").count() === 50L)
  }

  test("pushed filters rewrite logical→physical on mapped tables") {
    // unit: the rewriter maps top-level, nested, and composite trees
    import org.apache.spark.sql.sources._
    val cm = Map("label" -> "v", "meta" -> "m0", "meta.alpha" -> "a")
    def phys(f: Filter) = GraftPartitions.toPhysicalFilter(f, cm)
    assert(phys(EqualTo("label", "x")) === Some(EqualTo("v", "x")))
    assert(phys(GreaterThan("meta.alpha", 1.0)) ===
      Some(GreaterThan("m0.a", 1.0)))
    assert(phys(In("other", Array(1, 2))) === Some(In("other", Array(1, 2))))
    assert(phys(And(IsNotNull("label"), Or(StringStartsWith("label", "p"),
      Not(LessThan("meta.alpha", 0.5))))) ===
      Some(And(IsNotNull("v"), Or(StringStartsWith("v", "p"),
        Not(LessThan("m0.a", 0.5))))))
    // end-to-end: a renamed column's predicate still answers exactly (the
    // rewritten filter rides into the parquet reader; a wrong physical
    // name would row-group-prune live rows away on this disjoint layout)
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.fpush")
    sql("CREATE TABLE gct.db.fpush (id BIGINT, v STRING, s STRUCT<a: BIGINT>) " +
      "TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.fpush SELECT id, concat('low', id), " +
      "named_struct('a', id) FROM range(0, 50)")
    sql("INSERT INTO gct.db.fpush SELECT id, concat('high', id), " +
      "named_struct('a', id) FROM range(1000, 1050)")
    sql("ALTER TABLE gct.db.fpush RENAME COLUMN v TO label")
    sql("ALTER TABLE gct.db.fpush RENAME COLUMN s.a TO alpha")
    assert(sql("SELECT count(*) AS c FROM gct.db.fpush " +
      "WHERE label LIKE 'high%'").collect().head.getLong(0) === 50L)
    assert(sql("SELECT count(*) AS c FROM gct.db.fpush " +
      "WHERE s.alpha >= 1000").collect().head.getLong(0) === 50L)
    assert(sql("SELECT label FROM gct.db.fpush WHERE id = 1007")
      .collect().head.getString(0) === "high1007")
    // filter on a post-rename ADDed column: absent from old files, the
    // per-file parquet pushdown skips it there, answers stay exact
    sql("ALTER TABLE gct.db.fpush ADD COLUMN extra BIGINT")
    sql("INSERT INTO gct.db.fpush SELECT id, 'tail', named_struct('alpha', id), " +
      "7L FROM range(2000, 2010)")
    assert(sql("SELECT count(*) AS c FROM gct.db.fpush WHERE extra = 7")
      .collect().head.getLong(0) === 10L)
  }

  test("CALL table_changes surfaces the CDF to SQL; cap and option-rejection") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.tcf")
    sql("CREATE TABLE gct.db.tcf (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id', 'cdf'='true')")
    sql("INSERT INTO gct.db.tcf VALUES (1, 'a'), (2, 'b'), (3, 'c')") // v1
    sql("UPDATE gct.db.tcf SET v = 'B' WHERE id = 2")                 // v2
    sql("DELETE FROM gct.db.tcf WHERE id = 3")                        // v3
    val feed = sql(
      "CALL gct.system.table_changes(table => 'db.tcf', from_version => 2)")
      .select("id", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(feed == Set(
      (2L, "b", "update_preimage", 2L), (2L, "B", "update_postimage", 2L),
      (3L, "c", "delete", 3L)), s"got $feed")
    // from_version 0: the whole history, initial inserts included
    val all = sql("CALL gct.system.table_changes(" +
      "table => 'db.tcf', from_version => 0)")
    assert(all.filter("_change_type = 'insert'").count() === 3L)
    // the driver-memory cap fails loudly and names the distributed reader
    val err = intercept[Exception](sql("CALL gct.system.table_changes(" +
      "table => 'db.tcf', from_version => 0, max_rows => 2)").collect())
    assert(err.getMessage.contains("readChangeFeed"))
    // the scan OPTION on a catalog table is rejected, pointing here
    val err2 = intercept[Exception](
      spark.read.option("readChangeFeed", "true").table("gct.db.tcf")
        .collect())
    assert(err2.getMessage.contains("table_changes"))
  }

  test("CALL graft.system procedures: history, optimize, vacuum") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("CREATE TABLE gct.db.m (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    // disjoint key ranges: each merge reuses every existing file and
    // appends a new one — a small-file pileup for optimize to repay
    (0 until 4).foreach { i =>
      sql(s"INSERT INTO gct.db.m SELECT id, CAST(id AS STRING) " +
        s"FROM range(${i * 1000}, ${i * 1000 + 1000})")
    }
    val hist = sql("CALL gct.system.history(table => 'db.m')").collect()
    assert(hist.length === 5) // create + 4 inserts — newest first
    assert(hist.head.getLong(0) === 4L && hist.last.getLong(0) === 0L)
    assert(hist.head.getLong(5) === 4000L) // live rows
    assert(storeFiles("db/m") === 4)
    val opt = sql("CALL gct.system.optimize(table => 'db.m', target_files => 1)")
      .collect()
    assert(opt.length === 1 && opt.head.getLong(0) === 5L)
    assert(opt.head.getInt(1) === 4, "all four small files compacted")
    // dry run: report the reclaim, touch nothing
    val dry = sql("CALL gct.system.vacuum(table => 'db.m', keep_last => 1, " +
      "dry_run => true)").collect()
    assert(dry.length === 1 && dry.head.getInt(0) >= 4 &&
      dry.head.getBoolean(1))
    assert(sql("SELECT count(*) FROM gct.db.m VERSION AS OF 4")
      .head.getLong(0) === 4000L, "dry run must not reap anything")
    val vac = sql("CALL gct.system.vacuum(table => 'db.m', keep_last => 1)")
      .collect()
    assert(vac.length === 1 && vac.head.getInt(0) >= 4)
    // table still answers after maintenance
    assert(sql("SELECT count(*) FROM gct.db.m").collect().head.getLong(0) === 4000L)
    // ZORDER recluster: id is also the long column; add a double via stats
    sql("ALTER TABLE gct.db.m ADD COLUMN score DOUBLE")
    sql("INSERT INTO gct.db.m SELECT id, 'z', CAST(id AS DOUBLE) " +
      "FROM range(4000, 4100)")
    val z = sql("CALL gct.system.zorder(table => 'db.m', " +
      "long_col => 'id', double_col => 'score', target_files => 2)").collect()
    assert(z.length === 1 && z.head.getLong(0) > 0L)
    assert(sql("SELECT count(*) FROM gct.db.m").collect().head.getLong(0) === 4100L)
    // DESCRIBE DETAIL: version, key, live rows, dv debt, bytes
    val det = sql("CALL gct.system.detail(table => 'db.m')").collect()
    assert(det.length === 1)
    assert(det.head.getString(1) === "id")
    assert(det.head.getLong(3) === 4100L) // live rows
    assert(det.head.getLong(6) > 0L)      // bytes from the manifest
  }

  test("CALL graft.system.files lists per-file manifest metadata") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("CREATE TABLE gct.db.fl (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id', 'bloomfilter'='true')")
    sql("INSERT INTO gct.db.fl SELECT id, CAST(id AS STRING) " +
      "FROM range(0, 1000)")
    sql("DELETE FROM gct.db.fl WHERE id < 10")
    val rows = sql("CALL gct.system.files(table => 'db.fl')").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum === 1000L, "rows")
    assert(rows.map(_.getLong(2)).sum === 990L, "live rows net of the DV")
    assert(rows.map(_.getLong(3)).sum === 10L, "dv debt visible")
    assert(rows.forall(_.getLong(4) > 0L), "bytes from the manifest")
    rows.foreach(r =>
      assert(r.getString(5).toLong <= r.getString(6).toLong, "key range"))
    // sidecar counts surface the key blooms (1/file) plus the delete's DV
    assert(rows.map(_.getInt(8)).sum >= rows.length + 1,
      s"sidecars: ${rows.map(_.getInt(8)).toSeq}")
  }

  test("CALL optimize scoped to one partition leaves the rest untouched") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.po")
    sql("CREATE TABLE gct.db.po (id BIGINT, day STRING, v STRING) " +
      "PARTITIONED BY (day) TBLPROPERTIES ('key'='id')")
    // three disjoint-key inserts x two partitions -> a small-file pileup
    // in BOTH partitions
    (0 until 3).foreach { i =>
      sql(s"INSERT INTO gct.db.po SELECT id, " +
        s"CASE WHEN id % 2 = 0 THEN 'd0' ELSE 'd1' END, CAST(id AS STRING) " +
        s"FROM range(${i * 1000}, ${i * 1000 + 1000})")
    }
    val root = java.nio.file.Paths.get(warehouse, "db", "po").toString
    val st = new graft.cdc.ManifestStore(root, spark, "id")
    def byDay(d: String): Set[String] = st.currentManifest.get.files
      .filter(_.cols.get("day").exists(_._1 == d)).map(_.name).toSet
    val d0Before = byDay("d0"); val d1Before = byDay("d1")
    assert(d0Before.size >= 3 && d1Before.size >= 3,
      s"pileup expected, got d0=${d0Before.size} d1=${d1Before.size}")
    val r = sql("CALL gct.system.optimize(table => 'db.po', " +
      "target_files => 1, where_col => 'day', where_value => 'd0')")
      .collect().head
    assert(r.getLong(0) > 0L, "scoped optimize must commit")
    // d1's files carried BY NAME; d0's compacted
    assert(byDay("d1") === d1Before, "out-of-scope files must not move")
    assert(byDay("d0").size < d0Before.size, "in-scope files must compact")
    assert(byDay("d0").intersect(d0Before).isEmpty)
    assert(sql("SELECT count(*) FROM gct.db.po").head.getLong(0) === 3000L)
    assert(sql("SELECT count(*) FROM gct.db.po WHERE day = 'd0'")
      .head.getLong(0) === 1500L)
  }

  test("CHECK constraints: validated on add, enforced on every write path") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.chk")
    sql("CREATE TABLE gct.db.chk (id BIGINT, amt DOUBLE, seg STRING) " +
      "TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.chk VALUES (1, 10.0, 'a'), (2, 20.0, 'b')")
    // adding a constraint the existing data violates is refused
    val bad = intercept[Exception](sql(
      "ALTER TABLE gct.db.chk SET TBLPROPERTIES ('check.big' = 'amt > 15')"))
    assert(bad.getMessage.contains("existing row"), bad.getMessage)
    assert(!sql("SHOW TBLPROPERTIES gct.db.chk").collect()
      .exists(_.getString(0) == "check.big"), "refused constraint must not persist")
    // a satisfiable constraint persists and gates every later write
    sql("ALTER TABLE gct.db.chk SET TBLPROPERTIES ('check.pos' = 'amt > 0')")
    sql("INSERT INTO gct.db.chk VALUES (3, 30.0, 'c')") // passes
    val ins = intercept[Exception](
      sql("INSERT INTO gct.db.chk VALUES (4, -1.0, 'd')"))
    assert(ins.getMessage.contains("check") ||
      ins.getMessage.contains("CHECK"), ins.getMessage)
    val upd = intercept[Exception](
      sql("UPDATE gct.db.chk SET amt = -5.0 WHERE id = 1"))
    assert(upd.getMessage.contains("CHECK") || upd.getMessage.contains("check"),
      upd.getMessage)
    // NULL violates (SQL CHECK enforcement semantics, as Delta applies them)
    val nul = intercept[Exception](
      sql("INSERT INTO gct.db.chk VALUES (5, CAST(NULL AS DOUBLE), 'e')"))
    assert(nul.getMessage.contains("CHECK") || nul.getMessage.contains("check"),
      nul.getMessage)
    // the failed writes left no trace
    assert(sql("SELECT count(*) FROM gct.db.chk").head.getLong(0) === 3L)
    assert(sql("SELECT min(amt) FROM gct.db.chk").head.getDouble(0) === 10.0)
    // merge-on-read DML routes its upsert file through the same gate
    sql("ALTER TABLE gct.db.chk SET TBLPROPERTIES ('mor'='true')")
    val mor = intercept[Exception](
      sql("UPDATE gct.db.chk SET amt = -9.0 WHERE id = 2"))
    assert(mor.getMessage.contains("CHECK") || mor.getMessage.contains("check"),
      mor.getMessage)
    sql("UPDATE gct.db.chk SET amt = 99.0 WHERE id = 2") // passing MoR write
    assert(sql("SELECT amt FROM gct.db.chk WHERE id = 2")
      .head.getDouble(0) === 99.0)
    // UNSET lifts the gate
    sql("ALTER TABLE gct.db.chk UNSET TBLPROPERTIES ('check.pos')")
    sql("INSERT INTO gct.db.chk VALUES (6, -7.0, 'f')")
    assert(sql("SELECT count(*) FROM gct.db.chk").head.getLong(0) === 4L)
  }

  test("CALL restore resets content to a past version; history survives") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.rst")
    sql("CREATE TABLE gct.db.rst (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id')")                       // version 0, empty
    sql("INSERT INTO gct.db.rst VALUES (1, 'a'), (2, 'b')") // version 1
    sql("INSERT INTO gct.db.rst VALUES (3, 'c')")           // version 2
    sql("DELETE FROM gct.db.rst WHERE id = 1")              // version 3
    assert(sql("SELECT count(*) FROM gct.db.rst").head.getLong(0) === 2L)
    val r = sql("CALL gct.system.restore(table => 'db.rst', version => 1)")
      .collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === 4L)
    assert(sql("SELECT v FROM gct.db.rst ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("a", "b"))
    // history intact: the pre-restore present is still addressable...
    assert(sql("SELECT count(*) FROM gct.db.rst VERSION AS OF 3")
      .head.getLong(0) === 2L)
    // ...which makes the restore itself undoable
    sql("CALL gct.system.restore(table => 'db.rst', version => 3)")
    assert(sql("SELECT count(*) FROM gct.db.rst").head.getLong(0) === 2L)
    assert(sql("SELECT max(id) FROM gct.db.rst").head.getLong(0) === 3L)
    // writes continue normally on the restored state
    sql("INSERT INTO gct.db.rst VALUES (4, 'd')")
    assert(sql("SELECT count(*) FROM gct.db.rst").head.getLong(0) === 3L)
    // a non-past target is refused
    val err = intercept[Exception](
      sql("CALL gct.system.restore(table => 'db.rst', version => 99)"))
    assert(err.getMessage.contains("past version"), err.getMessage)
  }

  test("CALL clone creates an independent zero-copy table") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.csrc")
    sql("DROP TABLE IF EXISTS gct.db.cdst")
    sql("CREATE TABLE gct.db.csrc (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.csrc SELECT id, concat('v', id) FROM range(0, 200)")
    sql("DELETE FROM gct.db.csrc WHERE id < 10") // a DV sidecar travels too
    val r = sql("CALL gct.system.clone(source => 'db.csrc', " +
      "target => 'db.cdst')").collect().head
    assert(r.getLong(1) === 0L, "clone starts at version 0")
    assert(sql("SELECT count(*) FROM gct.db.cdst").head.getLong(0) === 190L)
    // the sides are independent: diverging writes never cross
    sql("INSERT INTO gct.db.cdst VALUES (1000, 'clone-only')")
    sql("DELETE FROM gct.db.csrc WHERE id >= 100")
    assert(sql("SELECT count(*) FROM gct.db.cdst").head.getLong(0) === 191L)
    assert(sql("SELECT count(*) FROM gct.db.csrc").head.getLong(0) === 90L)
    // vacuuming the source must not break the clone's hardlinked files
    sql("CALL gct.system.optimize(table => 'db.csrc', target_files => 2)")
    sql("CALL gct.system.vacuum(table => 'db.csrc', keep_last => 1)")
    assert(sql("SELECT count(*) FROM gct.db.cdst").head.getLong(0) === 191L)
    // an existing target is refused
    val err = intercept[Exception](
      sql("CALL gct.system.clone(source => 'db.csrc', target => 'db.cdst')"))
    assert(err.getMessage.contains("already exists"), err.getMessage)
  }

  test("predicate pushdown prunes catalog-resolved scans at planning time") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("CREATE TABLE gct.db.p (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    (0 until 4).foreach { i =>
      sql(s"INSERT INTO gct.db.p SELECT id, CAST(id AS STRING) " +
        s"FROM range(${i * 1000}, ${i * 1000 + 1000})")
    }
    assert(storeFiles("db/p") === 4)
    val df = sql("SELECT * FROM gct.db.p WHERE id BETWEEN 2100 AND 2110")
    assert(df.count() === 11)
    // zone-map pruning planned only the one file whose range intersects
    val parts = df.rdd.getNumPartitions
    assert(parts === 1, s"planned $parts partitions over 4 files")
  }

  test("CREATE TABLE AS SELECT seeds the table through the write path") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.ctas")
    sql("CREATE TABLE gct.db.ctas TBLPROPERTIES ('key'='id') AS " +
      "SELECT id, CAST(id AS STRING) AS v FROM range(500)")
    assert(sql("SELECT count(*) FROM gct.db.ctas").collect().head.getLong(0) === 500L)
    // CTAS result is a normal keyed table: upserts and deletes work
    sql("INSERT INTO gct.db.ctas VALUES (7, 'seven')")
    assert(sql("SELECT v FROM gct.db.ctas WHERE id = 7").collect()
      .head.getString(0) === "seven")
  }

  test("TRUNCATE TABLE empties the table, history keeps the past") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.tr")
    sql("CREATE TABLE gct.db.tr (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.tr SELECT id, 'x' FROM range(100)")
    sql("TRUNCATE TABLE gct.db.tr")
    assert(sql("SELECT count(*) FROM gct.db.tr").collect().head.getLong(0) === 0L)
    assert(sql("SELECT count(*) FROM gct.db.tr VERSION AS OF 1")
      .collect().head.getLong(0) === 100L)
    sql("INSERT INTO gct.db.tr VALUES (1, 'back')")
    assert(sql("SELECT count(*) FROM gct.db.tr").collect().head.getLong(0) === 1L)
  }

  test("ALTER TABLE SET TBLPROPERTIES persists and re-routes commits") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.props")
    sql("CREATE TABLE gct.db.props (id BIGINT, v STRING) TBLPROPERTIES ('key'='id')")
    (0 until 4).foreach { i =>
      sql(s"INSERT INTO gct.db.props SELECT id, 'x' " +
        s"FROM range(${i * 1000}, ${i * 1000 + 1000})")
    }
    sql("ALTER TABLE gct.db.props SET TBLPROPERTIES ('mor'='true')")
    val root = java.nio.file.Paths.get(warehouse, "db", "props").toString
    assert(GraftCatalog.readProps(root).get("mor").contains("true"))
    val st = new graft.cdc.ManifestStore(root, spark, "id")
    val before = st.currentManifest.get.files.map(_.name).toSet
    // scattered UPDATE now masks instead of rewriting
    sql("UPDATE gct.db.props SET v = 'hit' WHERE id IN (10, 1010, 2010, 3010)")
    assert(before.subsetOf(st.currentManifest.get.files.map(_.name).toSet))
    assert(st.currentManifest.get.files.exists(_.dv.isDefined))
    sql("ALTER TABLE gct.db.props UNSET TBLPROPERTIES ('mor')")
    assert(!GraftCatalog.readProps(root).contains("mor"))
    // the key property is fixed
    val e = intercept[Exception](
      sql("ALTER TABLE gct.db.props SET TBLPROPERTIES ('key'='v')"))
    assert(e.getMessage.contains("fixed"))
  }

  test("ALTER COLUMN TYPE widens losslessly, metadata-only; narrowing rejected") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.wd")
    sql("CREATE TABLE gct.db.wd (id BIGINT, n INT, f FLOAT) " +
      "TBLPROPERTIES ('key'='id')")
    sql("INSERT INTO gct.db.wd VALUES (1, 100, CAST(1.5 AS FLOAT))")
    val filesBefore = storeFiles("db/wd")
    sql("ALTER TABLE gct.db.wd ALTER COLUMN n TYPE BIGINT")
    sql("ALTER TABLE gct.db.wd ALTER COLUMN f TYPE DOUBLE")
    assert(storeFiles("db/wd") === filesBefore, "widening must not touch files")
    val r = sql("SELECT n, f FROM gct.db.wd WHERE id = 1").collect().head
    assert(r.getLong(0) === 100L && r.getDouble(1) === 1.5)
    // new-typed writes land next to old-vintage files
    sql("INSERT INTO gct.db.wd VALUES (2, 5000000000, 2.5)")
    assert(sql("SELECT sum(n) FROM gct.db.wd").collect().head.getLong(0)
      === 5000000100L)
    // narrowing is loss — Spark's analyzer already rejects it (upcast-only
    // rule); the store's own evolveSchema guard backstops non-SQL callers
    val e = intercept[Exception](
      sql("ALTER TABLE gct.db.wd ALTER COLUMN n TYPE INT"))
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("lossless"))
    val st = new graft.cdc.ManifestStore(
      java.nio.file.Paths.get(warehouse, "db", "wd").toString, spark, "id")
    val narrow = org.apache.spark.sql.types.StructType.fromDDL(
      st.currentManifest.get.schemaDDL.replace("n BIGINT", "n INT"))
    val e2 = intercept[Exception](st.evolveSchema(narrow))
    assert(e2.getMessage.contains("lossless"))
  }

  test("SHOW TBLPROPERTIES surfaces key and persisted properties") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.sp")
    sql("CREATE TABLE gct.db.sp (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id', 'mor'='true')")
    val props = sql("SHOW TBLPROPERTIES gct.db.sp").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("key").contains("id"))
    assert(props.get("mor").contains("true"))
  }

  test("malformed maintenance properties fail at DDL time, not ingest time") {
    sql("CREATE NAMESPACE IF NOT EXISTS gct.db")
    sql("DROP TABLE IF EXISTS gct.db.bp")
    sql("CREATE TABLE gct.db.bp (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='id')")
    // a typo'd value must refuse HERE — silently disabling maintenance
    // at ingest time is the failure mode this guards against
    intercept[Exception](sql("ALTER TABLE gct.db.bp SET TBLPROPERTIES " +
      "('autocompact.files'='soon')"))
    intercept[Exception](sql("ALTER TABLE gct.db.bp SET TBLPROPERTIES " +
      "('retention.versions'='0')"))
    intercept[Exception](sql("CREATE TABLE gct.db.bp2 (id BIGINT) " +
      "TBLPROPERTIES ('key'='id', 'autocompact.files'='yes')"))
    // valid values still land
    sql("ALTER TABLE gct.db.bp SET TBLPROPERTIES " +
      "('autocompact.files'='8', 'retention.versions'='3')")
    val props = sql("SHOW TBLPROPERTIES gct.db.bp").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("autocompact.files").contains("8"))
    assert(props.get("retention.versions").contains("3"))
  }

  private def storeFiles(rel: String): Int = {
    val d = java.nio.file.Paths.get(warehouse, rel, "files")
    if (!java.nio.file.Files.isDirectory(d)) 0
    else {
      val s = java.nio.file.Files.list(d)
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
  }
}
