package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Hash-bucketed snapshot storage: the scale evolution of [[SnapshotStore]].
  *
  * The flat store rewrites the whole table every commit — fine for demo
  * scale, quadratic pain at 100 TB. Delta's MERGE only rewrites files that
  * contain matched keys; this store gets the same property from static hash
  * bucketing:
  *
  *   root/manifest.json        {"batchId": n, "buckets": {"0": v0, ...}}
  *   root/b_<i>/v_<n>/         immutable parquet per (bucket, version)
  *
  * A micro-batch touches the buckets its keys hash into; only those buckets
  * are read for the merge and only those get a new version — untouched
  * buckets are untouched files. With B buckets and a batch touching k of
  * them, commit I/O is O(table/B * k), not O(table). The manifest swap is
  * the single atomic commit point (tmp + ATOMIC_MOVE), and the recorded
  * batchId makes replay a no-op exactly like the flat store.
  */
final class BucketedSnapshotStore(val root: String, spark: SparkSession,
                                  val numBuckets: Int) {
  private val manifestFile = Paths.get(root, "manifest.json")
  private val mapper = new ObjectMapper()

  /** Bucket count actually in effect: an existing store's manifest wins over
    * the constructor argument — reopening with a different count would hash
    * keys into the wrong buckets and merge against the wrong files.
    */
  lazy val effectiveBuckets: Int = current.map(_.numBuckets) match {
    case Some(stored) =>
      if (stored != numBuckets)
        System.err.println(s"[bucketed-store] $root was created with $stored " +
          s"buckets; adopting it (constructor asked for $numBuckets)")
      stored
    case None => numBuckets
  }

  /** Bucket id expression for a key column (consistent hash, non-negative). */
  def bucketOf(key: Column): Column = pmod(hash(key), lit(effectiveBuckets))

  final case class Manifest(batchId: Long, streamId: String, buckets: Map[Int, Long],
                            numBuckets: Int)

  def current: Option[Manifest] =
    if (!Files.exists(manifestFile)) None
    else {
      val rootNode = mapper.readTree(Files.readString(manifestFile))
      val buckets = rootNode.path("buckets").properties().asScala
        .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
      Some(Manifest(rootNode.path("batchId").asLong(),
        rootNode.path("streamId").asText("default"), buckets,
        // manifests written before numBuckets was recorded: trust the caller
        rootNode.path("numBuckets").asInt(numBuckets)))
    }

  def exists: Boolean = current.isDefined

  private def bucketPath(b: Int, v: Long) = s"$root/b_$b/v_$v"

  /** Full-table read: union of every bucket's current version. */
  def read(): Option[DataFrame] = current.map { m =>
    readPaths(m.buckets.toSeq.map { case (b, v) => bucketPath(b, v) })
  }

  /** Selective read of only the given buckets — the merge path. */
  def readBuckets(buckets: Seq[Int]): Option[DataFrame] = current.map { m =>
    val paths = buckets.flatMap(b => m.buckets.get(b).map(v => bucketPath(b, v)))
    readPaths(paths)
  }

  private def readPaths(paths: Seq[String]): DataFrame =
    if (paths.isEmpty)
      spark.emptyDataFrame // caller handles schema for never-written buckets
    else spark.read.parquet(paths: _*)

  /** Commit new contents for `touched` buckets only. `df` must already be
    * restricted to rows of those buckets and carry the key column. Returns
    * false (no-op) when batchId was already applied.
    */
  def commit(df: DataFrame, keyField: String, touched: Seq[Int],
             batchId: Long, streamId: String = "default"): Boolean = {
    val cur = current
    // replay no-op only within the same stream lineage (see SnapshotStore)
    if (cur.exists(c => c.streamId == streamId && c.batchId >= batchId)) return false
    val prevBuckets = cur.map(_.buckets).getOrElse(Map.empty)
    val nextVersion = (prevBuckets.values ++ Seq(-1L)).max + 1

    // one job writes all touched buckets, hash-partitioned on disk;
    // repartition on the bucket column first so each bucket lands as one
    // file (partitionBy alone writes a file per task per bucket)
    val tmp = s"$root/_staging_v$nextVersion"
    df.withColumn("_bucket", bucketOf(col(keyField)))
      .repartition(col("_bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(tmp)

    val written = touched.filter { b =>
      val src = Paths.get(tmp, s"_bucket=$b")
      val dst = Paths.get(bucketPath(b, nextVersion))
      if (Files.isDirectory(src)) {
        Files.createDirectories(dst.getParent)
        // a crashed prior attempt (moved dirs, manifest never swapped) may
        // have left an unreferenced dst — clear it so replay can commit
        deleteRecursively(dst)
        Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
        true
      } else {
        // bucket emptied by this batch (all rows deleted): write an empty dir
        Files.createDirectories(dst)
        // keep schema-bearing empty parquet for consistent reads
        false
      }
    }
    // buckets that became empty still advance (their rows were all deleted)
    val emptied = touched.filterNot(written.contains)
    emptied.foreach { b =>
      val dst = Paths.get(bucketPath(b, nextVersion))
      Files.createDirectories(dst)
      df.filter(bucketOf(col(keyField)) === b).limit(0)
        .write.mode(SaveMode.Overwrite).parquet(dst.toString)
    }
    deleteRecursively(Paths.get(tmp))

    val newBuckets = prevBuckets ++ touched.map(_ -> nextVersion)
    val node = mapper.createObjectNode()
    node.put("batchId", batchId)
    node.put("streamId", streamId)
    node.put("numBuckets", effectiveBuckets)
    val bn = mapper.createObjectNode()
    newBuckets.toSeq.sortBy(_._1).foreach { case (b, v) => bn.put(b.toString, v) }
    node.set[com.fasterxml.jackson.databind.node.ObjectNode]("buckets", bn)
    Files.createDirectories(Paths.get(root))
    val tmpManifest = Paths.get(root, "manifest.json.tmp")
    Files.write(tmpManifest, mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    Files.move(tmpManifest, manifestFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // reap superseded versions of the touched buckets, retaining the one
    // just replaced for in-flight readers of the pre-swap manifest
    touched.foreach { b =>
      prevBuckets.get(b).foreach { prevV =>
        val bdir = Paths.get(root, s"b_$b")
        if (Files.isDirectory(bdir)) {
          val vs = Files.list(bdir)
          try vs.filter(_.getFileName.toString.startsWith("v_"))
            .filter(_.getFileName.toString.stripPrefix("v_").toLong < prevV)
            .forEach(deleteRecursively)
          finally vs.close()
        }
      }
    }
    true
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
