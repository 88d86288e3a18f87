package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Merge semantics: upsert/delete with the ts guard, `r` handling, and a
  * property check that applying a random changelog reproduces last-write-wins
  * replay (the invariant the reference validates empirically with
  * test/cdc_test_framework.py + validate_cdc_data.py).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  val fields = Seq("id", "name")

  /** net-change rows in flattened shape (what dedupLatest emits). */
  private def netDf(rows: Seq[(Long, String, Option[String], Long)]) =
    rows.map { case (id, op, name, ts) =>
      (id, op, if (op == "d") None else Some(id), name, ts)
    }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name", Changelog.TsCol)
      .withColumn("after_id", col("after_id").cast("long"))

  private def snapDf(rows: Seq[(Long, String, Option[Long])]) =
    rows.toDF("id", "name", Merge.LastTsCol)

  test("upsert inserts new keys and updates existing ones; r behaves like c") {
    val snap = snapDf(Seq((1L, "old", Some(10L))))
    val net = netDf(Seq(
      (1L, "u", Some("new"), 20L),   // update existing
      (2L, "c", Some("ins"), 20L),   // insert
      (3L, "r", Some("snap"), 20L))) // snapshot read — ref drops these
    val out = Merge.applyChanges(snap, net, "id", fields)
      .select("id", "name").collect().toSet
    assert(out == Set(Row(1L, "new"), Row(2L, "ins"), Row(3L, "snap")))
  }

  test("delete removes the row; stale delete does not regress newer state") {
    val snap = snapDf(Seq((1L, "live", Some(100L)), (2L, "gone", Some(50L))))
    val net = netDf(Seq(
      (1L, "d", None, 90L),   // stale delete (ts < last_ts) — must be ignored
      (2L, "d", None, 60L)))  // fresh delete — must remove
    val out = Merge.applyChanges(snap, net, "id", fields)
      .select("id", "name").collect().toSet
    assert(out == Set(Row(1L, "live")))
  }

  test("stale update cannot regress state; tsGuard=false restores ref behavior") {
    val snap = snapDf(Seq((1L, "newer", Some(100L))))
    val net = netDf(Seq((1L, "u", Some("stale"), 90L)))
    val guarded = Merge.applyChanges(snap, net, "id", fields)
    assert(guarded.select("name").as[String].collect().toSeq == Seq("newer"))
    val unguarded = Merge.applyChanges(snap, net, "id", fields, tsGuard = false)
    assert(unguarded.select("name").as[String].collect().toSeq == Seq("stale"))
  }

  test("hintBroadcast=false keeps semantics (AQE-chosen joins)") {
    val snap = snapDf(Seq((1L, "old", Some(10L)), (2L, "gone", Some(5L))))
    val net = netDf(Seq((1L, "u", Some("new"), 20L), (2L, "d", None, 20L),
      (3L, "c", Some("ins"), 20L)))
    val (hinted, c1) = Merge.applyChangesWithCleanup(snap, net, "id", fields)
    val (unhinted, c2) = Merge.applyChangesWithCleanup(snap, net, "id", fields,
      hintBroadcast = false)
    assert(hinted.collect().toSet == unhinted.collect().toSet)
    c1(); c2()
  }

  test("re-applying the same batch is a no-op (idempotence / exactly-once)") {
    val snap = snapDf(Seq((1L, "a", Some(10L))))
    val net = netDf(Seq((1L, "u", Some("b"), 20L), (2L, "c", Some("c"), 20L)))
    val once = Merge.applyChanges(snap, net, "id", fields)
    val twice = Merge.applyChanges(once, net, "id", fields)
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("insertOnly only adds absent keys") {
    val snap = snapDf(Seq((1L, "keep", None)))
    val rows = Seq((1L, "clobber", Option.empty[Long]), (2L, "add", Option.empty[Long]))
      .toDF("id", "name", Merge.LastTsCol)
    val out = Merge.insertOnly(snap, rows, "id").select("id", "name").collect().toSet
    assert(out == Set(Row(1L, "keep"), Row(2L, "add")))
  }

  test("property: merge equals last-write-wins replay of a random changelog") {
    val opGen = for {
      key <- Gen.choose(0L, 5L)
      op <- Gen.oneOf("c", "u", "d", "r")
      name <- Gen.alphaStr.map(_.take(4))
    } yield (key, op, name)
    val seqGen = Gen.listOfN(40, opGen)
    val prop = Prop.forAll(seqGen) { ops =>
      // assign strictly increasing ts so replay order is unambiguous
      val stamped = ops.zipWithIndex.map { case ((k, op, n), i) => (k, op, n, i.toLong + 1) }
      // sequential replay oracle
      val expected = stamped.foldLeft(Map.empty[Long, (String, Long)]) {
        case (state, (k, "d", _, _)) => state - k
        case (state, (k, _, n, ts))  => state + (k -> (n, ts))
      }
      // engine: dedup to net change per key, then merge into empty snapshot
      val net = Changelog.dedupLatest(
        stamped.map { case (k, op, n, ts) =>
          (k, op, if (op == "d") None else Some(k), n, ts)
        }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name", Changelog.TsCol)
          .withColumn("after_id", col("after_id").cast("long")))
      val empty = snapDf(Nil)
      val out = Merge.applyChanges(empty, net, "id", fields)
        .select("id", "name").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out == expected.map { case (k, (n, _)) => k -> n }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
