package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.Files

/** Truncated STRING zone-map stats (table property `stats.truncate=N`,
  * Iceberg's `truncate(N)` metrics mode): over-budget string stats store
  * WIDENED bounds — min as a codepoint-boundary prefix, max as the prefix
  * with its last codepoint incremented — so a 100 TB text corpus whose
  * zone map tracks a document column pays O(N) manifest bytes per file
  * instead of two document-sized strings. Soundness contract: widened
  * bounds can only OVER-KEEP in every pruning consumer; min == max still
  * implies exactness (a widened file's min sits strictly below and its
  * max strictly above the real bounds, so they can never meet), which
  * keeps group-purity and single-value reasoning gate-free; consumers
  * that need exact VALUES — string MIN/MAX aggregate pushdown — refuse
  * via the `stats.truncate` gate; and the property is one-way (UNSET
  * refused) because files already carrying widened bounds would
  * otherwise be trusted as exact.
  */
class StatsTruncateSpec extends SparkSpec {
  import spark.implicits._

  private def u8(s: String) = UTF8String.fromString(s)
  private def leq(a: String, b: String) = u8(a).compareTo(u8(b)) <= 0
  private def lt(a: String, b: String) = u8(a).compareTo(u8(b)) < 0

  test("truncMin/truncMax: bounds are sound, tight, and codepoint-clean") {
    // ASCII: plain prefix + last-byte bump
    assert(ManifestStore.truncMin("hello world", 5) == "hello")
    assert(ManifestStore.truncMax("hello world", 5) == "hellp")
    // fits exactly -> exact both ways
    assert(ManifestStore.truncMin("abc", 3) == "abc")
    assert(ManifestStore.truncMax("abc", 3) == "abc")
    // multi-byte codepoint straddling the budget is dropped whole
    // ("é" = 2 bytes: budget 3 keeps only "ab")
    assert(ManifestStore.truncMin("abé", 3) == "ab")
    assert(ManifestStore.truncMax("abéxyz", 3) == "ac")
    // increment skips the surrogate hole: U+D7FF bumps to U+E000
    val sHole = "a\uD7FF" + "tail"
    val mx = ManifestStore.truncMax(sHole, 4)
    assert(mx == "a\uE000", s"surrogate hole: ${mx.codePoints().toArray.toSeq}")
    // un-incrementable last codepoint carries to an earlier one
    val sMax = "b" + new String(Character.toChars(0x10FFFF)) + "tail"
    assert(ManifestStore.truncMax(sMax, 5) == "c")
    // all-U+10FFFF prefix cannot widen: full value survives (sound)
    val allMax = new String(Character.toChars(0x10FFFF)) * 4
    assert(ManifestStore.truncMax(allMax + "x", 4) == allMax + "x")
    // a budget below the first codepoint's width yields the empty prefix
    // for min (<= everything) and the FULL value for max
    val wide = new String(Character.toChars(0x1F600)) + "abc" // 4-byte cp
    assert(ManifestStore.truncMin(wide, 3) == "")
    assert(ManifestStore.truncMax(wide, 3) == wide)
    // ordering invariants hold across a randomized sweep, in UTF8 binary
    // order (what the pruners compare in)
    val rnd = new scala.util.Random(7)
    val alphabet = "abzé漢ÿĀ" + new String(Character.toChars(0x1F600))
    val cps = alphabet.codePoints().toArray
    (1 to 500).foreach { _ =>
      val len = 1 + rnd.nextInt(12)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      val s = sb.toString
      val n = 1 + rnd.nextInt(8)
      val mn = ManifestStore.truncMin(s, n)
      val mxx = ManifestStore.truncMax(s, n)
      assert(leq(mn, s), s"truncMin('$s',$n)='$mn' must sort <= the value")
      assert(leq(s, mxx), s"truncMax('$s',$n)='$mxx' must sort >= the value")
      // widened bounds never meet: min==max still implies exactness
      if (mn != s || mxx != s)
        assert(lt(mn, mxx), s"widened bounds met: '$mn' vs '$mxx' for '$s'")
    }
  }

  test("store stats widen under stats.truncate; pruning matches a full twin") {
    val rootT = Files.createTempDirectory("trunc_t").toString
    val rootF = Files.createTempDirectory("trunc_f").toString
    // long text values that correlate with the key so files get tight,
    // orderable text ranges — the shape that makes prefix pruning fire
    val df = (0L until 4000L).map(i =>
      (i, f"doc-${i / 500}%02d-" + ("lorem ipsum " * 20) + i)).toDF("id", "txt")
    val stT = new ManifestStore(rootT, spark, "id")
    ManifestStore.writeTableProps(rootT, Map("stats.truncate" -> "16"))
    stT.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("txt"))
    val stF = new ManifestStore(rootF, spark, "id")
    stF.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("txt"))
    val m = stT.currentManifest.get
    // every recorded txt stat respects the byte budget (+4 slack: the
    // widened max's incremented codepoint may encode wider)
    m.files.foreach { f =>
      val (mn, mx) = f.cols("txt")
      assert(mn.getBytes("UTF-8").length <= 16, s"min over budget: '$mn'")
      assert(mx.getBytes("UTF-8").length <= 20, s"max over budget: '$mx'")
    }
    // the widened bounds bracket each file's REAL extremes (read back
    // from the file itself — file boundaries aren't deterministic across
    // commits, so the twin can't be matched per-file)
    m.files.foreach { f =>
      val real = spark.read
        .parquet(java.nio.file.Paths.get(rootT, "files", f.name).toString)
        .agg(min("txt"), max("txt")).head()
      val (tmn, tmx) = f.cols("txt")
      assert(leq(tmn, real.getString(0)),
        s"widened min '$tmn' above exact '${real.getString(0).take(30)}…'")
      assert(leq(real.getString(1), tmx),
        s"widened max '$tmx' below exact '${real.getString(1).take(30)}…'")
    }
    // prefix pruning still fires (the 16-byte budget preserves the
    // discriminating "doc-NN-" prefix) and answers match the full twin
    val hitT = spark.read.format("graft").load(rootT)
      .filter(col("txt").startsWith("doc-03-"))
    val hitF = spark.read.format("graft").load(rootF)
      .filter(col("txt").startsWith("doc-03-"))
    assert(hitT.count() == 500L && hitF.count() == 500L)
    hitT.collect()
    val planned = hitT.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputPartitions.size }.get
    assert(planned >= 1 && planned <= 3,
      s"truncated stats must still prune the prefix scan, planned $planned")
    // equality pruning stays sound: a key's own row always comes back
    val probe = df.filter($"id" === 1234L).head().getString(1)
    assert(spark.read.format("graft").load(rootT)
      .filter(col("txt") === probe).count() == 1L)
  }

  test("string MIN/MAX aggregate pushdown refuses on a truncated table") {
    val root = Files.createTempDirectory("trunc_agg").toString
    val st = new ManifestStore(root, spark, "id")
    ManifestStore.writeTableProps(root, Map("stats.truncate" -> "8"))
    val df = (0L until 2000L).map(i => (i, "value-" * 5 + f"$i%06d"))
      .toDF("id", "txt")
    st.commit(df, batchId = 0, nFiles = 4, statsCols = Seq("txt"))
    val t = spark.read.format("graft").load(root)
    // MIN/MAX must come from a REAL scan (a stats answer would return a
    // widened bound the column never held) — and still be correct
    val r = t.agg(min("txt"), max("txt")).head()
    val e = df.agg(min("txt"), max("txt")).head()
    assert(r.getString(0) == e.getString(0) && r.getString(1) == e.getString(1))
    val aggPlan = t.agg(min("txt")).queryExecution.executedPlan.toString
    assert(aggPlan.contains("BatchScan"),
      s"string MIN under stats.truncate must plan a real scan:\n$aggPlan")
    // COUNT pushdown is value-free: still answered from metadata
    val cntPlan = t.agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(!cntPlan.contains("BatchScan"),
      s"COUNT(*) must stay stats-answered:\n$cntPlan")
    assert(t.agg(count(lit(1))).head().getLong(0) == 2000L)
    // the KEY's min/max stats stay exact — its pushdown survives
    val keyPlan =
      t.agg(min("id"), max("id")).queryExecution.executedPlan.toString
    assert(!keyPlan.contains("BatchScan"),
      s"key MIN/MAX must stay stats-answered:\n$keyPlan")
    val kr = t.agg(min("id"), max("id")).head()
    assert(kr.getLong(0) == 0L && kr.getLong(1) == 1999L)
  }

  test("grouped pushdown: purity never falsely holds; partition cols exempt") {
    val wh = Files.createTempDirectory("trunc_wh").toString
    spark.conf.set("spark.sql.catalog.gtr", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtr.db")
    // a partitioned table whose partition VALUES are longer than the
    // budget: the exemption keeps them exact, so files stay
    // partition-pure and GROUP BY still answers from metadata
    spark.sql("CREATE TABLE gtr.db.tp (id BIGINT, seg STRING, txt STRING) " +
      "PARTITIONED BY (seg) TBLPROPERTIES ('key'='id', 'statscols'='txt', " +
      "'stats.truncate'='8')")
    spark.sql("INSERT INTO gtr.db.tp SELECT id, " +
      "CASE CAST(id % 2 AS INT) WHEN 0 THEN 'segment-alpha-long' ELSE " +
      "'segment-beta-longer' END, repeat('x', 40) || CAST(id AS STRING) " +
      "FROM range(0, 2000)")
    val root = java.nio.file.Paths.get(wh, "db", "tp").toString
    val m = new ManifestStore(root, spark, "id").currentManifest.get
    // partition-column stats are exact (pure) despite exceeding the budget
    m.files.foreach { f =>
      val (mn, mx) = f.cols("seg")
      assert(mn == mx && mn.startsWith("segment-"),
        s"partition col must stay exact/pure: ($mn, $mx)")
      // the tracked text column DID truncate
      val (tmn, _) = f.cols("txt")
      assert(tmn.getBytes("UTF-8").length <= 8, s"txt min over budget: '$tmn'")
    }
    val g = spark.table("gtr.db.tp").groupBy("seg").agg(count(lit(1)).as("n"))
    g.collect()
    assert(g.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b }.isEmpty,
      "partition-grouped COUNT must stay metadata-answered under truncation")
    assert(g.as[(String, Long)].collect().toMap ==
      Map("segment-alpha-long" -> 1000L, "segment-beta-longer" -> 1000L))
    // a truncated single-value file never reports min==max, so a GROUP BY
    // on the truncated column refuses (real scan) instead of inventing
    // group keys from widened bounds — and the answer is still right
    val gt = spark.table("gtr.db.tp")
      .groupBy(substring(col("txt"), 1, 1).as("p")).agg(count(lit(1)))
    assert(gt.collect().map(_.getLong(1)).sum == 2000L)
    spark.sql("DROP TABLE gtr.db.tp")
  }

  test("stats.truncate is one-way: UNSET refused, junk refused at DDL") {
    val wh = Files.createTempDirectory("trunc_wh2").toString
    spark.conf.set("spark.sql.catalog.gtr2", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtr2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtr2.db")
    spark.sql("CREATE TABLE gtr2.db.t (id BIGINT, txt STRING) " +
      "TBLPROPERTIES ('key'='id', 'stats.truncate'='16')")
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE gtr2.db.t UNSET TBLPROPERTIES ('stats.truncate')")
    }
    assert(ex.getMessage.contains("cannot be unset"), ex.getMessage)
    // lowering the budget is fine (still gated, still widened-or-exact)
    spark.sql("ALTER TABLE gtr2.db.t SET TBLPROPERTIES ('stats.truncate'='8')")
    // malformed values fail the DDL, not the next write
    val bad = intercept[Exception] {
      spark.sql("ALTER TABLE gtr2.db.t SET TBLPROPERTIES ('stats.truncate'='nope')")
    }
    assert(bad.getMessage.contains("stats.truncate"), bad.getMessage)
    spark.sql("DROP TABLE gtr2.db.t")
  }

  test("promoted (1x-write) commits truncate identically to the stats pass") {
    val wh = Files.createTempDirectory("trunc_wh3").toString
    spark.conf.set("spark.sql.catalog.gtr3", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtr3.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtr3.db")
    spark.sql("CREATE TABLE gtr3.db.tw (id BIGINT, seg STRING, txt STRING) " +
      "PARTITIONED BY (seg) TBLPROPERTIES ('key'='id', 'statscols'='txt', " +
      "'stats.truncate'='10')")
    spark.sql("INSERT INTO gtr3.db.tw SELECT id, 'A', " +
      "repeat('paragraph ', 30) || CAST(id AS STRING) FROM range(0, 1500)")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql("INSERT OVERWRITE gtr3.db.tw SELECT id, 'A', " +
      "repeat('paragraph ', 30) || CAST(id AS STRING) FROM range(0, 1500)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val root = java.nio.file.Paths.get(wh, "db", "tw").toString
    val m = new ManifestStore(root, spark, "id").currentManifest.get
    assert(m.streamId.startsWith("dsv2-owp1x-"),
      s"expected the promoted lineage, got '${m.streamId}'")
    m.files.foreach { f =>
      val (mn, mx) = f.cols("txt")
      assert(mn.getBytes("UTF-8").length <= 10,
        s"promoted min over budget: '$mn'")
      assert(mx.getBytes("UTF-8").length <= 14,
        s"promoted max over budget: '$mx'")
      assert(leq(mn, mx))
      // widened bounds bracket the file's real extremes
      val real = spark.read
        .parquet(java.nio.file.Paths.get(root, "files", f.name).toString)
        .agg(min("txt"), max("txt")).head()
      assert(leq(mn, real.getString(0)) && leq(real.getString(1), mx),
        s"promoted bounds ('$mn','$mx') don't bracket " +
          s"('${real.getString(0).take(20)}…','${real.getString(1).take(20)}…')")
    }
    assert(spark.table("gtr3.db.tw").count() == 1500L)
    spark.sql("DROP TABLE gtr3.db.tw")
  }
}
