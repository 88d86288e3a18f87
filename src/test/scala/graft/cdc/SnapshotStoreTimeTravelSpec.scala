package graft.cdc

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Time travel / history / vacuum on the versioned snapshot store — the
  * Delta-parity read-side semantics (DESCRIBE HISTORY, VERSION AS OF,
  * TIMESTAMP AS OF, VACUUM) on top of the parquet + manifest layout.
  */
class SnapshotStoreTimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def store(retain: Int) =
    new SnapshotStore(Files.createTempDirectory("snaptt").toString, spark,
      retain = retain)

  private def seed(st: SnapshotStore, n: Int): Unit =
    (0 until n).foreach { i =>
      st.commit(Seq((1L, s"v$i")).toDF("id", "v"), batchId = i.toLong)
    }

  test("history lists committed versions newest-first with batch ids") {
    val st = store(retain = 10)
    seed(st, 3)
    val h = st.history()
    assert(h.map(_.version) == Seq(2L, 1L, 0L))
    assert(h.map(_.batchId) == Seq(2L, 1L, 0L))
    assert(h.forall(_.op == "commit"))
    // commit times are monotone non-decreasing along versions
    assert(h.map(_.tsMillis).reverse == h.map(_.tsMillis).reverse.sorted)
  }

  test("readVersion serves any retained version; reaped and future -> None") {
    val st = store(retain = 2) // default window: current + parent
    seed(st, 4)
    assert(st.readVersion(3).get.collect().head.getString(1) == "v3")
    assert(st.readVersion(2).get.collect().head.getString(1) == "v2")
    assert(st.readVersion(1).isEmpty) // auto-reaped past the window
    assert(st.readVersion(99).isEmpty) // beyond _CURRENT: uncommitted
    // history still documents the reaped commits (log outlives data)
    assert(st.history().map(_.version) == Seq(3L, 2L, 1L, 0L))
  }

  test("retain > 2 holds the full time-travel window open") {
    val st = store(retain = 10)
    seed(st, 5)
    (0 to 4).foreach { v =>
      assert(st.readVersion(v.toLong).get.collect().head.getString(1) == s"v$v")
    }
  }

  test("readAsOf resolves the latest version at or before the timestamp") {
    val st = store(retain = 10)
    st.commit(Seq((1L, "old")).toDF("id", "v"), batchId = 0)
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(5) // commit timestamps have millis resolution
    st.commit(Seq((1L, "new")).toDF("id", "v"), batchId = 1)
    assert(st.readAsOf(betweenCommits).get.collect().head.getString(1) == "old")
    assert(st.readAsOf(System.currentTimeMillis()).get
      .collect().head.getString(1) == "new")
    // before the table existed
    assert(st.readAsOf(st.history().last.tsMillis - 1).isEmpty)
  }

  test("vacuum reaps below the keep window, never current, keeps history") {
    val st = store(retain = 10)
    seed(st, 5)
    assert(st.vacuum(keepLast = 2) == Seq(0L, 1L, 2L))
    assert(!Files.isDirectory(Paths.get(st.root, "v_0")))
    assert(st.readVersion(2).isEmpty)
    assert(st.readVersion(3).isDefined && st.readVersion(4).isDefined)
    assert(st.history().map(_.version) == Seq(4L, 3L, 2L, 1L, 0L))
    // idempotent; keepLast=1 reaps everything but current
    assert(st.vacuum(keepLast = 2).isEmpty)
    assert(st.vacuum(keepLast = 1) == Seq(3L))
    assert(st.read().get.collect().head.getString(1) == "v4")
    intercept[IllegalArgumentException](st.vacuum(keepLast = 0))
  }

  test("time travel across a retained pair feeds ChangeFeed.diff") {
    val st = store(retain = 10)
    st.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), batchId = 0)
    st.commit(Seq((1L, "a2"), (3L, "c")).toDF("id", "v"), batchId = 1)
    val feed = ChangeFeed.diff(st.readVersion(0).get, st.readVersion(1).get,
      key = "id")
    val byOp = feed.collect().map(r => (r.getAs[String]("operation"),
      r.getAs[Long]("id"))).toSet
    assert(byOp == Set(("u", 1L), ("d", 2L), ("c", 3L)))
  }

  test("compaction appears in history as op=compact with the source batchId") {
    val st = store(retain = 10)
    st.commit((0L until 50L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(6), batchId = 9)
    assert(st.compact().contains(1L))
    val h = st.history()
    assert(h.head.op == "compact" && h.head.batchId == 9L)
    assert(h(1).op == "commit" && h(1).batchId == 9L)
  }
}
