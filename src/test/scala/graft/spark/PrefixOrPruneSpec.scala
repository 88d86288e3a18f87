package graft.spark

import graft.SparkSpec
import graft.cdc.ManifestStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Manifest-level file pruning for `LIKE 'prefix%'` and OR-trees — the
  * two most common user predicates that previously only pruned parquet
  * ROW GROUPS (the readers got them) but scanned every FILE. A prefix
  * `p` prunes to files whose [min,max] intersects [p, succ(p)); an OR
  * prunes to the UNION of its branches' file sets, with `=` leaves
  * inside branches still Bloom-probed. Oversized IN lists (past the
  * flat-expression cap) keep their range envelope in the Column pass and
  * are then Bloom-probed DRIVER-side against the full key set — the
  * DPP/runtime-filter case on bucketed tables where a range envelope
  * admits everything.
  */
class PrefixOrPruneSpec extends SparkSpec {
  import spark.implicits._

  private def plannedFiles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputPartitions.map {
        case gb: GraftBucketedPartition => gb.inner.length
        case _ => 1
      }.sum
    }.getOrElse(-1)
  }

  test("prefixSuccessor: tight sound upper bounds") {
    assert(ManifestStore.prefixSuccessor("ab").contains("ac"))
    assert(ManifestStore.prefixSuccessor("a").contains("b"))
    assert(ManifestStore.prefixSuccessor("").isEmpty)
    // trailing max code point drops, previous increments
    val maxCp = new String(Character.toChars(Character.MAX_CODE_POINT))
    assert(ManifestStore.prefixSuccessor("a" + maxCp).contains("b"))
    assert(ManifestStore.prefixSuccessor(maxCp + maxCp).isEmpty)
    // surrogate gap jumped: U+D7FF + 1 -> U+E000
    assert(ManifestStore.prefixSuccessor("x퟿").contains("x"))
    // properties on ordinary strings: p <= any p-prefixed s < succ(p)
    for (p <- Seq("host003", "a/b/c", "z", "étud")) {
      val u = ManifestStore.prefixSuccessor(p).get
      assert(p < u)
      assert((p + "zzz") < u)
      assert((p + "￿") < u)
    }
  }

  test("LIKE 'prefix%' prunes files on string zone-map stats") {
    val root = Files.createTempDirectory("prefixpr").toString
    val st = new ManifestStore(root, spark, "id")
    // key-clustered 8 files; url correlates with the key, so each file
    // holds one contiguous url range (the natural shape after clustering
    // or Z-ordering on the string column)
    val df = (0L until 4000L).map(i => (i, f"host${i / 500}%03d/page$i", i % 5))
      .toDF("id", "url", "grp")
    st.commit(df, batchId = 0, nFiles = 8, statsCols = Seq("url"))
    assert(st.currentManifest.get.files.size == 8)

    val pref = spark.read.format("graft").load(root)
      .filter(col("url").startsWith("host003"))
    val planned = plannedFiles(pref)
    assert(planned <= 3, s"prefix predicate should plan ~1-2 files, got $planned")
    assert(pref.count() == 500L)

    // answers stay exact vs the unpruned scan (residual re-evaluates)
    val expect = df.filter(col("url").startsWith("host003"))
      .select("id").as[Long].collect().toSet
    val got = pref.select("id").as[Long].collect().toSet
    assert(got == expect)

    // prefix past every file's range plans zero files
    val none = spark.read.format("graft").load(root)
      .filter(col("url").startsWith("zzz"))
    assert(plannedFiles(none) == 0)
    assert(none.count() == 0L)

    // a prefix that IS a full shared prefix of everything prunes nothing
    val all = spark.read.format("graft").load(root)
      .filter(col("url").startsWith("host"))
    assert(all.count() == 4000L)
  }

  test("OR-tree prunes to the union of its branches' file sets") {
    val root = Files.createTempDirectory("orpr").toString
    val st = new ManifestStore(root, spark, "id")
    val df = (0L until 4000L).map(i => (i, s"n$i")).toDF("id", "name")
    st.commit(df, batchId = 0, nFiles = 8)

    // two disjoint ranges at opposite ends: middle files must drop
    val or = spark.read.format("graft").load(root)
      .filter(col("id") < 300L || col("id") >= 3700L)
    val planned = plannedFiles(or)
    assert(planned <= 4, s"range-OR should plan ~2 edge files, got $planned")
    assert(or.count() == 600L)

    // nested OR (three branches) still unions
    val or3 = spark.read.format("graft").load(root)
      .filter(col("id") < 300L || (col("id") >= 1500L && col("id") < 1800L) ||
        col("id") >= 3700L)
    val planned3 = plannedFiles(or3)
    assert(planned3 <= 5, s"3-branch OR should plan ~3 files, got $planned3")
    assert(or3.count() == 900L)

    // a branch with NO decidable leaf admits everything: no pruning, but
    // answers stay exact
    val orWeak = spark.read.format("graft").load(root)
      .filter(col("id") < 300L || col("name").contains("n399"))
    assert(plannedFiles(orWeak) == 8)
    assert(orWeak.count() == 300L + 11L) // n399, n3990..n3999
  }

  test("=-only OR branches Bloom-probe on a bucketed table") {
    val root = Files.createTempDirectory("orbloom").toString
    ManifestStore.writeTableProps(root,
      Map("buckets" -> "8", "bloomfilter" -> "8192"))
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 4000L).map(i => (i, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 8)

    // every bucket file's range covers ~the whole domain, so ranges admit
    // all 8 files for any point; the OR's two = leaves must Bloom down to
    // the ~2 files that really hold the keys
    val or = spark.read.format("graft").load(root)
      .filter(col("id") === 17L || col("id") === 3901L)
    val planned = plannedFiles(or)
    assert(planned <= 3, s"=-OR should Bloom-prune to ~2 files, got $planned")
    assert(or.count() == 2L)
  }

  test("oversized IN lists Bloom-probe driver-side") {
    val root = Files.createTempDirectory("bigin").toString
    // 32768-bit blooms: ~65 bits/key at 500 keys/file, so even 15k absent
    // probes accumulate <1% per-file false-positive mass
    ManifestStore.writeTableProps(root,
      Map("buckets" -> "8", "bloomfilter" -> "32768"))
    val st = new ManifestStore(root, spark, "id")
    // sparse keys (multiples of 16) leave in-range ABSENT values for the
    // probe list, so the range envelope alone can never prune
    st.commit((0L until 4000L).map(i => (i * 16, s"n$i")).toDF("id", "name"),
      batchId = 0, nFiles = 8)

    val present = Seq(16L, 800L * 16, 3900L * 16)
    val absent = (0 until 15000).map(i => i.toLong * 4 + 1) // never % 16 == 0
    val vals = (present ++ absent).map(java.lang.Long.valueOf)
    val in = spark.read.format("graft").load(root)
      .filter(col("id").isin(vals: _*))
    val planned = plannedFiles(in)
    assert(planned <= 4,
      s"driver-side Bloom probe should plan ~3 files for 3 live keys, got $planned")
    assert(in.count() == 3L)

    // soundness fuzz: random present subsets always all come back
    val rnd = new scala.util.Random(7)
    val keys = (0L until 4000L).map(_ * 16)
    val picks = Seq.fill(40)(keys(rnd.nextInt(keys.size))).distinct
    val bigList = (picks ++ absent).map(java.lang.Long.valueOf)
    val got = spark.read.format("graft").load(root)
      .filter(col("id").isin(bigList: _*))
      .select("id").as[Long].collect().toSet
    assert(got == picks.toSet)
  }
}
