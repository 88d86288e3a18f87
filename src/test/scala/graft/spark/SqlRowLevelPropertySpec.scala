package graft.spark

import graft.SparkSpec

/** Property: an arbitrary (seeded) sequence of SQL DML statements leaves a
  * copy-on-write table, a merge-on-read table, and a driver-side
  * relational model in EXACTLY the same state. This pins the whole
  * row-level stack — rewrite planning, verdict staging, pruned CoW merge,
  * sidecar MoR merge, deletion-vector metadata deletes — to one another
  * and to the semantics a user can compute by hand.
  */
class SqlRowLevelPropertySpec extends SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_prop_wh_").toString

  private def sqlc2(q: String) = spark.sql(q)

  test("seeded DML script: CoW == MoR == relational model") {
    spark.conf.set("spark.sql.catalog.gprop", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gprop.warehouse", warehouse)
    sqlc2("CREATE NAMESPACE IF NOT EXISTS gprop.db")
    val tables = Seq(
      "gprop.db.cow" -> "'key'='id'",
      "gprop.db.mor" -> "'key'='id', 'mor'='true'")
    tables.foreach { case (t, props) =>
      sqlc2(s"DROP TABLE IF EXISTS $t")
      sqlc2(s"CREATE TABLE $t (id BIGINT, v STRING, amt DOUBLE) " +
        s"TBLPROPERTIES ($props)")
      (0 until 4).foreach { i =>
        sqlc2(s"INSERT INTO $t SELECT id, CAST(id AS STRING), " +
          s"CAST(id AS DOUBLE) FROM range(${i * 500}, ${i * 500 + 500})")
      }
    }
    // driver-side model: id -> (v, amt)
    var model: Map[Long, (String, Double)] =
      (0L until 2000L).map(i => i -> (i.toString, i.toDouble)).toMap

    val rnd = new scala.util.Random(42)
    (1 to 12).foreach { round =>
      rnd.nextInt(4) match {
        case 0 => // modulus UPDATE (row-level path: % is not pushable)
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          tables.foreach { case (t, _) => sqlc2(
            s"UPDATE $t SET v = 'u$round', amt = amt + 1 WHERE id % $m = $r") }
          model = model.map { case (k, (v, a)) =>
            if (k % m == r) k -> (s"u$round", a + 1) else k -> (v, a) }
        case 1 => // range DELETE (pushable: deletion-vector metadata path)
          val lo = rnd.nextInt(2500).toLong; val hi = lo + rnd.nextInt(120)
          tables.foreach { case (t, _) => sqlc2(
            s"DELETE FROM $t WHERE id BETWEEN $lo AND $hi") }
          model = model.filter { case (k, _) => k < lo || k > hi }
        case 2 => // IN-subquery DELETE (row-level path)
          val step = 7 + rnd.nextInt(13); val off = rnd.nextInt(step)
          spark.range(0, 3000).selectExpr("id")
            .filter(s"id % $step = $off").limit(40)
            .createOrReplaceTempView(s"prop_del_$round")
          tables.foreach { case (t, _) => sqlc2(
            s"DELETE FROM $t WHERE id IN (SELECT id FROM prop_del_$round)") }
          val dels = spark.table(s"prop_del_$round").collect()
            .map(_.getLong(0)).toSet
          model = model.filter { case (k, _) => !dels(k) }
        case 3 => // MERGE: update low half of sampled keys, insert fresh keys
          val base = 3000L + round * 100L
          spark.range(0, 30).selectExpr(
            s"CASE WHEN id < 15 THEN id * ${37 + round} % 2000 " +
              s"ELSE $base + id END AS sid",
            s"'m$round' AS sv").distinct()
            .createOrReplaceTempView(s"prop_src_$round")
          tables.foreach { case (t, _) => sqlc2(
            s"MERGE INTO $t x USING prop_src_$round s ON x.id = s.sid " +
              s"WHEN MATCHED THEN UPDATE SET v = s.sv " +
              s"WHEN NOT MATCHED THEN INSERT (id, v, amt) " +
              s"VALUES (s.sid, s.sv, -1.0)") }
          val src = spark.table(s"prop_src_$round").collect()
            .map(r => r.getLong(0) -> r.getString(1))
          src.foreach { case (k, sv) =>
            model = model.get(k) match {
              case Some((_, a)) => model + (k -> (sv, a))
              case None         => model + (k -> (sv, -1.0))
            }
          }
      }
    }

    def content(t: String): Set[(Long, String, Double)] =
      sqlc2(s"SELECT id, v, amt FROM $t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expected = model.map { case (k, (v, a)) => (k, v, a) }.toSet
    val cow = content("gprop.db.cow")
    val mor = content("gprop.db.mor")
    assert(cow === expected, "CoW table diverged from the model")
    assert(mor === expected, "MoR table diverged from the model")
    // and the MoR table actually exercised sidecars along the way
    val morRoot = java.nio.file.Paths.get(warehouse, "db", "mor").toString
    val st = new graft.cdc.ManifestStore(morRoot, spark, "id")
    assert(st.currentManifest.get.version > 10L)
  }
}
