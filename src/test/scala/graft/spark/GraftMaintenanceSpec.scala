package graft.spark

import graft.SparkSpec
import graft.cdc.{Changelog, ManifestStore}
import org.apache.spark.sql.functions._

/** The maintenance window's scoping paths directly: partitioned tables
  * compact ONLY the offending cells (out-of-scope files carry by name),
  * bucketed tables re-pack toward one file per bucket while staying
  * bucket-pure, and an unset property makes the probe free.
  */
class GraftMaintenanceSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mx_$tag").toString + "/t"

  private def upsert(st: ManifestStore, e: Int, keys: Seq[Long],
                     seg: String): Unit = {
    import spark.implicits._
    st.mergeOnReadLocked(
      keys.map(k => (k.toString, "u", e.toLong, k, seg, s"e$e"))
        .toDF(Changelog.KeyCol, Changelog.OpCol, Changelog.TsCol,
          "after_id", "after_seg", "after_v"),
      Seq("id", "seg", "v"), batchId = e.toLong, streamId = "mx",
      tsGuard = false)
    ()
  }

  test("partitioned: only the hot cell compacts; the cold cell's files carry") {
    import spark.implicits._
    val root = tmp("cell")
    ManifestStore.writeTableProps(root,
      Map("partitioncol" -> "seg", "autocompact.files" -> "4"))
    val st = new ManifestStore(root, spark, "id")
    // two cells: 'hot' keys 0..99, 'cold' keys 100..199
    st.commit((0L until 200L).map(i =>
      (i, if (i < 100) "hot" else "cold", "init")).toDF("id", "seg", "v"),
      batchId = 0, nFiles = 4, statsCols = Seq("seg"))
    val coldBefore = st.currentManifest.get.files
      .filter(_.cols.get("seg").exists(_._1 == "cold")).map(_.name).toSet
    assert(coldBefore.nonEmpty)
    // 8 epochs of inserts into the HOT cell only
    (1 to 8).foreach { e =>
      upsert(st, e, (0L until 10L).map(i => 1000L + e * 10 + i), "hot")
      GraftMaintenance.maybeSchedule(root, spark, "id")
    }
    assert(GraftMaintenance.drain())
    val m = st.currentManifest.get
    def cellFiles(seg: String) =
      m.files.filter(_.cols.get(m.phys("seg")).exists(_._1 == seg))
    assert(cellFiles("hot").size <= 4,
      s"hot cell not compacted: ${cellFiles("hot").size} files")
    // the cold cell was NEVER rewritten: same immutable names
    assert(cellFiles("cold").map(_.name).toSet === coldBefore,
      "cold cell files must carry by reference through cell-scoped passes")
    // content intact
    val rows = st.read().get
    assert(rows.count() === 280L)
    assert(rows.filter(col("seg") === "cold").count() === 100L)
    assert(rows.filter(col("v") === "e8").count() === 10L)
  }

  test("bucketed: a tripped bucket re-packs toward one file per bucket, pure") {
    import spark.implicits._
    val root = tmp("bkt")
    val n = 4
    ManifestStore.writeTableProps(root,
      Map("buckets" -> n.toString, "autocompact.files" -> "3"))
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 400L).map(i => (i, "x", "init")).toDF("id", "seg", "v"),
      batchId = 0, nFiles = n)
    (1 to 12).foreach { e =>
      upsert(st, e, Seq(2000L + e), "x") // one new key per epoch
      GraftMaintenance.maybeSchedule(root, spark, "id")
    }
    assert(GraftMaintenance.drain())
    val m = st.currentManifest.get
    assert(m.files.size <= n + 3,
      s"bucketed table not re-packed: ${m.files.size} files")
    // every live file is bucket-pure under the store's own hash
    assert(m.files.forall(_.bucket.isDefined), "re-pack must re-bucket")
    m.files.foreach { f =>
      val got = spark.read.parquet(s"$root/files/${f.name}")
        .select(pmod(hash(col("id")), lit(n)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      assert(got == Seq(f.bucket.get), s"file ${f.name} mixes buckets")
    }
    assert(st.read().get.count() === 412L)
  }

  test("no property set: the probe schedules nothing") {
    import spark.implicits._
    val root = tmp("off")
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 50L).map(i => (i, "x", "init")).toDF("id", "seg", "v"),
      batchId = 0, nFiles = 8)
    val before = GraftMaintenance.compactions.get()
    (1 to 5).foreach { e =>
      upsert(st, e, Seq(100L + e), "x")
      GraftMaintenance.maybeSchedule(root, spark, "id")
    }
    assert(GraftMaintenance.drain())
    assert(GraftMaintenance.compactions.get() === before)
    assert(st.currentManifest.get.files.size >= 8 + 5 - 1,
      "without the property every epoch's file must accrete untouched")
  }
}
