package graft.cdc

import graft.SparkSpec

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** The process-wide manifest LRU (ManifestStore.manifest): immutable
  * (root, version) entries served from memory, validated per hit against
  * the log file's (size, mtime) with one stat — so a vacuumed log entry or
  * a deleted-and-recreated root can never serve a stale file list.
  */
class ManifestCacheSpec extends SparkSpec {
  import spark.implicits._

  private def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally s.close()
    }

  test("repeated reads hit the cache; recreation invalidates by identity") {
    val root = Files.createTempDirectory("mcache").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 100L).map(i => (i, s"a$i")).toDF("id", "name"),
      batchId = 0, nFiles = 2)
    val first = st.currentManifest.get
    val h0 = ManifestStore.manifestCacheHits.get()
    // second read of the same version must come from cache
    val again = st.currentManifest.get
    assert(ManifestStore.manifestCacheHits.get() > h0, "expected a cache hit")
    assert(again.files.map(_.name) == first.files.map(_.name))

    // recreate the SAME path as a different table: the log file's identity
    // changes, so the cache must miss and re-parse — never serve v0 of the
    // old table
    rmTree(Paths.get(root))
    val st2 = new ManifestStore(root, spark, "id")
    st2.commit((0L until 37L).map(i => (i, s"b$i")).toDF("id", "name"),
      batchId = 0, nFiles = 1)
    val fresh = st2.currentManifest.get
    assert(fresh.files.map(_.name).toSet != first.files.map(_.name).toSet,
      "cache served the recreated root the OLD table's manifest")
    assert(fresh.files.map(_.rows).sum == 37L)
  }

  test("delta-log reconstruction reuses the cached parent") {
    val root = Files.createTempDirectory("mcache2").toString
    val st = new ManifestStore(root, spark, "id")
    st.commit((0L until 200L).map(i => (i, s"a$i")).toDF("id", "name"),
      batchId = 0, nFiles = 2)
    // delta commits on top of the checkpoint
    st.deleteWhere(org.apache.spark.sql.functions.col("id") < 10L, batchId = 1)
    st.currentManifest // warm the chain
    val h0 = ManifestStore.manifestCacheHits.get()
    val m = st.currentManifest.get
    assert(ManifestStore.manifestCacheHits.get() > h0)
    assert(m.version == 1L)
    assert(m.files.map(_.liveRows).sum == 190L)
  }
}
