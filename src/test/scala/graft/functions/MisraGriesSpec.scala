package graft.functions

import graft.SparkSpec
import graft.ops.HeavyHitters
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries aggregate: exactness below capacity, the two summary
  * theorems under forced partial/merge paths, SQL registration, and the
  * evaluation harness surfacing a violated guarantee.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def summaryMap(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val df = items.toDF("item").repartition(parts) // force partial buffers + merges
    HeavyHitters.summary(df, col("item"), k).head()
      .getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("below capacity the summary is exact (no decrements ever fire)") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(5)("c")
    val got = summaryMap(scala.util.Random.shuffle(items), k = 8, parts = 5)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 5L))
  }

  test("theorems hold on a skewed stream across many partitions") {
    val rnd = new scala.util.Random(7)
    val items = (0 until 20000).map { i =>
      if (rnd.nextInt(3) > 0) s"hot_${rnd.nextInt(3)}" else s"cold_${rnd.nextInt(4000)}"
    }
    val k = 16
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    val got = summaryMap(items, k, parts = 13)
    assert(got.size <= k - 1)
    // undercount only, by at most n/k
    got.foreach { case (item, est) =>
      assert(est <= exact(item), s"$item overcounted")
      assert((exact(item) - est) * k <= n, s"$item undercounted past n/k")
    }
    // every true heavy hitter present
    exact.collect { case (item, c) if c * k > n => item }
      .foreach(item => assert(got.contains(item), s"missing heavy hitter $item"))
  }

  test("misra_gries is callable from SQL") {
    Seq("x", "x", "y").toDF("item").createOrReplaceTempView("mg_in")
    val arr = spark.sql("SELECT misra_gries(item, 4) FROM mg_in")
      .head().getSeq[Row](0)
    assert(arr.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("x" -> 2L, "y" -> 1L))
  }

  test("null items are ignored; k below 2 is rejected at analysis") {
    val withNulls = Seq(Some("a"), None, Some("a"), None).toDF("item")
    assert(summaryMapOf(withNulls) == Map("a" -> 2L))
    val e = intercept[Exception] {
      Seq("a").toDF("item").agg(call_function("misra_gries", col("item"), lit(1))).head()
    }
    assert(e.getMessage.contains("misra_gries"))
  }

  private def summaryMapOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    HeavyHitters.summary(df, col("item"), 4).head()
      .getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap

  test("evalGuarantees reports every heavy hitter with both flags true") {
    val items = Seq.fill(500)("big") ++ (0 until 500).map(i => s"small_$i")
    val out = HeavyHitters.evalGuarantees(
      scala.util.Random.shuffle(items).toDF("item"), col("item"), 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(("big", 500L, true, true)))
  }
}
