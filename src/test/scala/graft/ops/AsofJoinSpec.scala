package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left(rows: (Long, Long, Long)*) = // (id, key, ts)
    rows.toDF("id", "k", "ts")
  private def right(rows: (Long, Long, Double)*) = // (key, ts, v)
    rows.toDF("k", "ts", "v")

  test("backward as-of picks latest right row with ts <= left ts, per key") {
    val l = left((1L, 10L, 5L), (2L, 10L, 2L), (3L, 20L, 1L))
    val r = right((10L, 3L, 100.0), (10L, 5L, 200.0), (20L, 9L, 300.0))
    val out = AsofJoin.backward(l, r, Seq("k"), "ts", Seq("v"))
      .select("id", "v").orderBy("id").collect().toSeq
    // id=1: right ts 5 matches inclusively; id=2: no right <= 2; id=3: none <= 1
    assert(out == Seq(Row(1L, 200.0), Row(2L, null), Row(3L, null)))
  }

  test("left rows never leak values to each other; right rows don't appear") {
    val l = left((1L, 7L, 4L), (2L, 7L, 6L))
    val r = right((7L, 5L, 50.0))
    val out = AsofJoin.backward(l, r, Seq("k"), "ts", Seq("v"))
    assert(out.count() == 2) // only left rows survive
    val byId = out.select("id", "v").collect().map(x => x.getLong(0) -> x.get(1)).toMap
    assert(byId(1L) == null) // ts 4 < first right ts 5
    assert(byId(2L) == 50.0)
  }

  test("value carries forward across multiple left rows until superseded") {
    val l = left((1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 30L))
    val r = right((1L, 5L, 1.0), (1L, 25L, 2.0))
    val vs = AsofJoin.backward(l, r, Seq("k"), "ts", Seq("v"))
      .orderBy("id").select("v").as[Double].collect().toSeq
    assert(vs == Seq(1.0, 1.0, 2.0))
  }

  test("colliding value column names are rejected") {
    val l = left((1L, 1L, 1L)).withColumnRenamed("id", "v")
    val r = right((1L, 1L, 1.0))
    intercept[IllegalArgumentException](
      AsofJoin.backward(l, r, Seq("k"), "ts", Seq("v")))
  }
}
