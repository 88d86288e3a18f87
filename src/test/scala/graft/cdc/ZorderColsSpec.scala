package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** N-column Z-order with RANK (equi-depth) binning
  * (ManifestStore.reclusterZorderCols): the skew-robust generalization of
  * the 2-column equi-width path. The decisive case: a heavy-tailed
  * dimension collapses equi-width bins into one hot bin (zone ranges stay
  * table-wide — no pruning), while rank bins fill every bin by
  * construction and the zone map prunes box predicates on EVERY
  * interleaved dimension.
  */
class ZorderColsSpec extends SparkSpec {
  import spark.implicits._

  // d1 uniform mod-64; d2 HEAVY-TAILED (99% in [0,99], 1% outliers around
  // 1e6 — the global [min,max] makes equi-width bin 0 hold 99% of rows);
  // d3 correlates with the key
  private def seed(n: Long) = (0L until n).map { i =>
    val d2 = if (i % 100 == 99) 1000000L + i else i % 100
    (i, s"n$i", i % 64, d2, (i / 64).toDouble)
  }.toDF("id", "name", "d1", "d2", "d3")

  test("rank bins prune a skewed dimension where equi-width cannot") {
    val N = 4096L
    // equi-width pair layout on (d2, d3): d2's hot bin swallows 99% of
    // rows, so d2 predicates in the hot range prune nothing
    val rootW = Files.createTempDirectory("zw").toString
    val stW = new ManifestStore(rootW, spark, "id")
    stW.commit(seed(N), batchId = 0, nFiles = 16,
      statsCols = Seq("d1", "d2", "d3"))
    assert(stW.reclusterZorder("d2", "d3", nFiles = 16, bits = 6).isDefined)
    val wSkip = stW.readWhere("d2", 10L, 20L).get._2
    assert(wSkip.nSkipped == 0,
      s"equi-width should be BLIND on the skewed dim (the documented gap): $wSkip")

    // rank-binned 3-column layout: every dimension prunes, including the
    // skewed one
    val rootR = Files.createTempDirectory("zr").toString
    val stR = new ManifestStore(rootR, spark, "id")
    stR.commit(seed(N), batchId = 0, nFiles = 16,
      statsCols = Seq("d1", "d2", "d3"))
    val bidBefore = stR.current.get._2
    assert(stR.reclusterZorderCols(Seq("d1", "d2", "d3"), nFiles = 16,
      bits = 6).isDefined)
    assert(stR.current.get._2 == bidBefore, "zorder is a maintenance commit")

    val d2Skip = stR.readWhere("d2", 10L, 20L).get._2
    assert(d2Skip.nSkipped > 0, s"rank bins must prune the skewed dim: $d2Skip")
    val d1Skip = stR.readWhere("d1", 10L, 15L).get._2
    assert(d1Skip.nSkipped > 0, s"d1 skip: $d1Skip")
    val d3Skip = stR.readWhere("d3", 0.0, 7.0).get._2
    assert(d3Skip.nSkipped > 0, s"d3 skip: $d3Skip")

    // content is EXACTLY preserved — layout machinery never reaches answers
    val (d2Df, _) = stR.readWhere("d2", 10L, 20L).get
    assert(d2Df.select("id").as[Long].collect().toSet ==
      (0L until N).filter(i => i % 100 != 99 && (10L to 20L).contains(i % 100)).toSet)
    assert(stR.read().get.count() == N)
  }

  test("date/timestamp dims normalize zone-free; misuse refuses loudly") {
    val N = 1024L
    val root = Files.createTempDirectory("zt").toString
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until N).map { i =>
      (i, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i % 300)),
        new java.sql.Timestamp(1700000000000L + (i % 500) * 86400000L),
        s"n$i")
    }.toDF("id", "day", "ts", "name")
    st.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("day", "ts"))
    assert(st.reclusterZorderCols(Seq("day", "ts"), nFiles = 8, bits = 6)
      .isDefined)
    assert(st.readWhere("day", java.sql.Date.valueOf("1970-01-11"),
      java.sql.Date.valueOf("1970-02-10")).get._2.nSkipped > 0)
    assert(st.read().get.count() == N)

    // result-bit overflow refuses
    intercept[IllegalArgumentException] {
      st.reclusterZorderCols(Seq("day", "ts"), nFiles = 8, bits = 32)
    }
    ()
  }

  test("string dims rank-bin by 8-byte prefix: prefix predicates prune after recluster") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def plannedFiles(df: DataFrame): Int = {
      df.collect()
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.inputPartitions.size
      }.getOrElse(-1)
    }
    val N = 4096L
    val root = Files.createTempDirectory("zstr").toString
    val st = new ManifestStore(root, spark, "id")
    // url's host is UNcorrelated with the key, so key clustering leaves
    // every file's url range table-wide — the prefix scan reads all 16
    val df = (0L until N).map(i =>
      (i, f"host${i % 20}%03d/page$i", i % 7)).toDF("id", "url", "grp")
    st.commit(df, batchId = 0, nFiles = 16, statsCols = Seq("url"))
    val before = spark.read.format("graft").load(root)
      .filter(col("url").startsWith("host003"))
    assert(plannedFiles(before) == 16, "pre-recluster: url scattered, no pruning")

    // Z-order on (url, id): the string dim rank-bins on its first 8
    // bytes ("host003/..." differs inside the prefix), so post-recluster
    // zone maps bound prefix predicates to a few files
    assert(st.reclusterZorderCols(Seq("url", "id"), nFiles = 16, bits = 6)
      .isDefined)
    val after = spark.read.format("graft").load(root)
      .filter(col("url").startsWith("host003"))
    val planned = plannedFiles(after)
    assert(planned >= 1 && planned <= 8,
      s"post-recluster prefix scan should prune files, got $planned of 16")
    // content exactly preserved (layout never reaches answers)
    assert(after.select("id").as[Long].collect().toSet ==
      (0L until N).filter(_ % 20 == 3).toSet)
    assert(st.read().get.count() == N)
  }
}
