package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import java.nio.file.{Files, Paths}

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store(n: Int = 8) =
    new BucketedSnapshotStore(Files.createTempDirectory("bst").toString, spark, n)

  private val fieldTypes = Seq("id" -> LongType, "name" -> StringType)

  /** net-change rows in the flattened shape dedupLatest emits. */
  private def netDf(rows: (Long, String, String, Long)*) =
    rows.map { case (id, op, name, ts) =>
      (id, op, if (op == "d") None else Some(id), if (op == "d") None else Some(name), ts)
    }.toDF(Changelog.KeyCol, Changelog.OpCol, "after_id", "after_name", Changelog.TsCol)
      .withColumn("after_id", col("after_id").cast("long"))

  test("apply + read round-trip across buckets") {
    val st = store()
    assert(BucketedMerge.applyBatch(spark, st,
      netDf((1L, "c", "a", 100), (2L, "c", "b", 100), (3L, "c", "c", 100)),
      "id", fieldTypes, batchId = 0))
    val rows = st.read().get.select("id", "name").collect().toSet
    assert(rows == Set(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
  }

  test("only touched buckets get new versions; untouched files stay put") {
    val st = store(n = 4)
    // seed all buckets
    BucketedMerge.applyBatch(spark, st,
      netDf((0 until 20).map(i => (i.toLong, "c", s"v$i", 100L)): _*),
      "id", fieldTypes, 0)
    val before = st.current.get.buckets
    // one-key update touches exactly one bucket
    BucketedMerge.applyBatch(spark, st, netDf((7L, "u", "v7b", 200)),
      "id", fieldTypes, 1)
    val after = st.current.get.buckets
    val changed = after.filter { case (b, v) => before.get(b) != Some(v) }.keys.toSeq
    assert(changed.size == 1)
    // untouched bucket dirs unchanged on disk
    val untouched = before.keySet -- changed.toSet
    untouched.foreach { b =>
      assert(after(b) == before(b))
      assert(Files.isDirectory(Paths.get(st.root, s"b_$b", s"v_${before(b)}")))
    }
    // merged content correct
    val rows = st.read().get.filter($"id" === 7L).select("name").as[String].collect()
    assert(rows.toSeq == Seq("v7b"))
    assert(st.read().get.count() == 20)
  }

  test("deletes and the ts guard work through the bucketed path") {
    val st = store(n = 4)
    BucketedMerge.applyBatch(spark, st,
      netDf((1L, "c", "keep", 100), (2L, "c", "gone", 100)), "id", fieldTypes, 0)
    // stale update of 1 ignored; fresh delete of 2 applies
    BucketedMerge.applyBatch(spark, st,
      netDf((1L, "u", "stale", 50), (2L, "d", "x", 200)), "id", fieldTypes, 1)
    val rows = st.read().get.select("id", "name").collect().toSet
    assert(rows == Set(Row(1L, "keep")))
  }

  test("replaying a batch id is a no-op") {
    val st = store()
    assert(BucketedMerge.applyBatch(spark, st, netDf((1L, "c", "a", 100)),
      "id", fieldTypes, 5))
    assert(!BucketedMerge.applyBatch(spark, st, netDf((1L, "u", "clobber", 900)),
      "id", fieldTypes, 5))
    assert(st.read().get.select("name").as[String].collect().toSeq == Seq("a"))
  }

  test("replaying a crashed commit succeeds despite orphaned version dirs") {
    val st = store(n = 4)
    BucketedMerge.applyBatch(spark, st, netDf((1L, "c", "a", 100)), "id", fieldTypes, 0)
    // simulate a crash mid-commit of batch 1: orphaned v_1 dirs exist for
    // the touched bucket but the manifest never advanced
    val bucket = spark.range(1).select(st.bucketOf(lit(1L))).head().getInt(0)
    val orphan = Paths.get(st.root, s"b_$bucket", "v_1", "garbage.txt")
    Files.createDirectories(orphan.getParent)
    Files.writeString(orphan, "leftover from crashed attempt")
    // replay of batch 1 must clear the orphan and commit cleanly
    assert(BucketedMerge.applyBatch(spark, st, netDf((1L, "u", "b", 200)),
      "id", fieldTypes, 1))
    assert(st.read().get.select("name").collect().map(_.getString(0)).toSeq == Seq("b"))
    assert(!Files.exists(orphan))
  }

  test("superseded bucket versions are reaped (previous retained)") {
    val st = store(n = 2)
    BucketedMerge.applyBatch(spark, st, netDf((1L, "c", "a", 100)), "id", fieldTypes, 0)
    BucketedMerge.applyBatch(spark, st, netDf((1L, "u", "b", 200)), "id", fieldTypes, 1)
    BucketedMerge.applyBatch(spark, st, netDf((1L, "u", "c", 300)), "id", fieldTypes, 2)
    val bucket = spark.range(1).select(st.bucketOf(lit(1L))).head().getInt(0)
    val versions = Files.list(Paths.get(st.root, s"b_$bucket")).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(versions)
      .asScala.map(_.getFileName.toString).toList.sorted
    assert(names == List("v_1", "v_2")) // v_0 reaped, previous + current kept
    assert(st.read().get.select("name").collect().map(_.getString(0)).toSeq == Seq("c"))
  }

  test("reopening with a different bucket count adopts the stored one") {
    val root = Files.createTempDirectory("bstnb").toString
    val st = new BucketedSnapshotStore(root, spark, 8)
    BucketedMerge.applyBatch(spark, st,
      netDf((0 until 16).map(i => (i.toLong, "c", s"v$i", 100L)): _*),
      "id", fieldTypes, 0)
    assert(st.current.get.numBuckets == 8)
    // reopen claiming 4 buckets: manifest must win, or selective merges
    // would hash keys into the wrong buckets
    val reopened = new BucketedSnapshotStore(root, spark, 4)
    assert(reopened.effectiveBuckets == 8)
    BucketedMerge.applyBatch(spark, reopened, netDf((7L, "u", "v7b", 200)),
      "id", fieldTypes, 1)
    assert(reopened.current.get.numBuckets == 8)
    val rows = reopened.read().get.select("id", "name").collect().toSet
    assert(rows.size == 16 && rows.contains(Row(7L, "v7b")))
  }

  test("matches the flat-store merge result on a random changelog") {
    val rnd = new scala.util.Random(7)
    val ops = (1 to 120).map { i =>
      val key = rnd.nextInt(15).toLong
      val op = Seq("c", "u", "d")(rnd.nextInt(3))
      (key, op, s"n$i", i.toLong)
    }
    // split into 3 batches, apply through both stores
    val st = store(n = 4)
    val flatSnap0 = Seq.empty[(Long, String, Option[Long])]
      .toDF("id", "name", Merge.LastTsCol)
    var flat = flatSnap0
    ops.grouped(40).zipWithIndex.foreach { case (chunk, i) =>
      val net = Changelog.dedupLatest(netDf(chunk: _*))
      BucketedMerge.applyBatch(spark, st, net, "id", fieldTypes, i)
      flat = Merge.applyChanges(flat, net, "id", Seq("id", "name"))
        .persist() // keep lineage short across iterations
    }
    val a = st.read().get.select("id", "name").collect().toSet
    val b = flat.select("id", "name").collect().toSet
    assert(a == b)
  }
}
