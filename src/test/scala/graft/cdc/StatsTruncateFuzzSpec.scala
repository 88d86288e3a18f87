package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Differential fuzz of the whole `stats.truncate` soundness claim:
  * whatever sequence of scattered upserts and deletes runs, and whatever
  * unicode the string column holds (multi-byte, emoji, U+10FFFF, the
  * surrogate-hole boundary), a truncated-stats table must answer every
  * query EXACTLY like its full-stats twin — widened bounds may only skip
  * fewer or more files, never rows. The probes cover every consumer the
  * truncation touches: equality, prefix, range (all pruned through the
  * widened bounds), MIN/MAX aggregates (gated off stats onto a real
  * scan), and counts.
  */
class StatsTruncateFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("randomized lifecycle: truncated table stays query-equal to its twin") {
    val rng = new scala.util.Random(1313L)
    val cps = "abz¢漢ÿ".codePoints().toArray ++
      Array(0x1F600, 0x10FFFF, 0xD7FF)
    def randStr(): String = {
      val sb = new java.lang.StringBuilder
      (0 until rng.nextInt(30)).foreach(_ =>
        sb.appendCodePoint(cps(rng.nextInt(cps.length))))
      sb.toString
    }
    def cpPrefix(s: String, n: Int): String = {
      val arr = s.codePoints().toArray.take(n)
      val sb = new java.lang.StringBuilder
      arr.foreach(sb.appendCodePoint)
      sb.toString
    }
    val N = 2000L
    def mk(trunc: Boolean): (String, ManifestStore) = {
      val root = Files.createTempDirectory(s"tfuzz$trunc").toString
      if (trunc)
        ManifestStore.writeTableProps(root, Map("stats.truncate" -> "6"))
      (root, new ManifestStore(root, spark, "id"))
    }
    val (rootT, stT) = mk(trunc = true)
    val (rootF, stF) = mk(trunc = false)
    val seedVals = (0L until N).map(i => (i, randStr()))
    stT.commit(seedVals.toDF("id", "txt"), batchId = 0, nFiles = 8,
      statsCols = Seq("txt"))
    stF.commit(seedVals.toDF("id", "txt"), batchId = 0, nFiles = 8,
      statsCols = Seq("txt"))
    val fields = Seq("id", "txt")

    (1 to 4).foreach { r =>
      val ups = Seq.fill(30)(rng.nextLong(2 * N)).distinct
        .map(k => (k, randStr()))
      val batch = ups.map { case (k, v) =>
        (k.toString, "u", k, v, (100 + r).toLong)
      }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_txt",
        Changelog.TsCol)
      stT.mergeOptimistic(batch, fields, batchId = r, tsGuard = false)
      stF.mergeOptimistic(batch, fields, batchId = r, tsGuard = false)
      val dk = rng.nextLong(2 * N)
      stT.deleteWhere(col("id") === dk, batchId = 100 + r)
      stF.deleteWhere(col("id") === dk, batchId = 100 + r)

      val tT = spark.read.format("graft").load(rootT)
      val tF = spark.read.format("graft").load(rootF)
      def ids(df: DataFrame): Seq[Long] =
        df.select("id").as[Long].collect().sorted.toSeq

      // equality: a value that exists + a random one (usually absent)
      Seq(ups.head._2, randStr()).foreach { v =>
        assert(ids(tT.filter(col("txt") === v)) ==
          ids(tF.filter(col("txt") === v)), s"round $r eq '$v'")
      }
      // prefix (LIKE 'p%'): pruned through widened bounds on one side
      val p = cpPrefix(randStr(), 2)
      assert(ids(tT.filter(col("txt").startsWith(p))) ==
        ids(tF.filter(col("txt").startsWith(p))), s"round $r prefix '$p'")
      // range: identical (possibly empty/inverted) predicate on both
      val (lo, hi) = (randStr(), randStr())
      assert(ids(tT.filter(col("txt") >= lo && col("txt") <= hi)) ==
        ids(tF.filter(col("txt") >= lo && col("txt") <= hi)),
        s"round $r range")
      // MIN/MAX: the truncated side is gated onto a real scan — answers
      // must be the exact values, never a widened bound
      val aT = tT.agg(min("txt"), max("txt"), count(lit(1))).head()
      val aF = tF.agg(min("txt"), max("txt"), count(lit(1))).head()
      assert(aT == aF, s"round $r agg: $aT vs $aF")
    }
  }
}
