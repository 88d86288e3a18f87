package graft.cdc

import graft.SparkSpec
import java.nio.file.Files

/** Optimistic (CAS) multi-writer commits on [[SnapshotStore]] — the one
  * storage semantic Delta provides that the plain single-writer `_CURRENT`
  * swap did not: two independent committers, the loser DETECTS the lost
  * race and retries against the winner's table instead of clobbering it.
  */
class SnapshotStoreConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def store() =
    new SnapshotStore(Files.createTempDirectory("snapcas").toString, spark)

  test("stale expected parent loses the CAS and nothing is clobbered") {
    val st = store()
    assert(st.commitIf(Seq((1L, "base")).toDF("id", "v"), batchId = 0,
      expectedParent = None) == Committed(0L))
    // two writers both read version 0, derive independently, then commit
    // in sequence — the deterministic interleaving of a race
    val a = Seq((1L, "base"), (2L, "from_a")).toDF("id", "v")
    val b = Seq((1L, "base"), (3L, "from_b")).toDF("id", "v")
    assert(st.commitIf(a, batchId = 1, expectedParent = Some(0L),
      streamId = "writer_a") == Committed(1L))
    // writer B's parent is stale: CAS must refuse, report the real version
    assert(st.commitIf(b, batchId = 1, expectedParent = Some(0L),
      streamId = "writer_b") == Conflict(Some(1L)))
    // the winner's table is untouched by the failed attempt
    assert(st.current.map(_._1).contains(1L))
    assert(st.read().get.collect().map(_.getString(1)).toSet ==
      Set("base", "from_a"))
  }

  test("the loser retries against the new snapshot and both writes land") {
    val st = store()
    st.commitIf(Seq((1L, 10L)).toDF("id", "n"), 0, None)
    // writer A sneaks a commit in while writer B derives from version 0
    val stale = st.read().get
    assert(st.commitIf(stale.union(Seq((2L, 20L)).toDF("id", "n")),
      1, Some(0L), "writer_a") == Committed(1L))
    // B's conflict-retry loop: re-read, re-derive (its row ON TOP of the
    // current table, Delta-MERGE style), re-CAS
    val out = st.commitOptimistic(batchId = 1, streamId = "writer_b") { cur =>
      cur.get.union(Seq((3L, 30L)).toDF("id", "n"))
    }
    assert(out == Committed(2L))
    assert(st.read().get.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("concurrent creators: exactly one creates, the other conflicts") {
    val st = store()
    assert(st.commitIf(Seq((1L, "x")).toDF("id", "v"), 0, None,
      "creator_a") == Committed(0L))
    assert(st.commitIf(Seq((2L, "y")).toDF("id", "v"), 0, None,
      "creator_b") == Conflict(Some(0L)))
  }

  test("batch replay short-circuits before the CAS (exactly-once preserved)") {
    val st = store()
    st.commitIf(Seq((1L, "a")).toDF("id", "v"), batchId = 7, None, "s1")
    assert(st.commitIf(Seq((2L, "b")).toDF("id", "v"), batchId = 7,
      expectedParent = Some(0L), streamId = "s1") == AlreadyApplied)
    // a DIFFERENT lineage's batch 7 is not a replay
    assert(st.commitIf(st.read().get.union(Seq((2L, "b")).toDF("id", "v")),
      batchId = 7, expectedParent = Some(0L), streamId = "s2") == Committed(1L))
  }

  test("two genuinely concurrent committers both land via the retry loop") {
    val st = store()
    st.commitIf(spark.range(1).select($"id", $"id".as("n")), 0, None)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val outcomes = Await.result(Future.sequence(Seq(100L, 200L).map(tag =>
      Future(st.commitOptimistic(batchId = 1, streamId = s"w$tag",
        maxAttempts = 5) { cur =>
        cur.get.union(Seq((tag, tag)).toDF("id", "n"))
      }))), 2.minutes)
    // both must eventually commit (at most one lost the first CAS)
    assert(outcomes.forall(_.isInstanceOf[Committed]), outcomes.toString)
    assert(outcomes.map { case Committed(v) => v }.toSet == Set(1L, 2L))
    val ids = st.read().get.collect().map(_.getLong(0)).toSet
    assert(Set(100L, 200L).subsetOf(ids), s"lost a concurrent write: $ids")
  }

  test("a zombie staging/version dir from a crashed writer cannot block commits") {
    val st = store()
    st.commitIf(Seq((1L, "a")).toDF("id", "v"), 0, None)
    // simulate a writer that staged v_1 and died before the manifest swap
    val zombie = java.nio.file.Paths.get(st.root, "v_1")
    Files.createDirectories(zombie)
    Files.write(zombie.resolve("garbage"), Array[Byte](1, 2, 3))
    assert(st.commitIf(Seq((1L, "b")).toDF("id", "v"), 1,
      Some(0L)) == Committed(1L))
    assert(st.read().get.collect().map(_.getString(1)).toSeq == Seq("b"))
  }
}
