package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Versioned keyed-table storage — the Delta-table replacement.
  *
  * The reference persists current state as a Delta table on S3A
  * (ref: cdc_stream.py:621-646); Delta gives it atomic commits and
  * idempotent re-application via MERGE. Without the Delta jars we get the
  * same guarantees from parquet + a manifest:
  *
  *   root/v_<n>/           immutable parquet snapshot (written once)
  *   root/_CURRENT         "<version>,<batchId>" — single source of truth,
  *                         swapped atomically (tmp file + ATOMIC_MOVE)
  *
  * - **Atomicity**: readers resolve `_CURRENT` first; a crash mid-write
  *   leaves a dangling `v_<n+1>` dir but `_CURRENT` still points at `v_<n>`.
  * - **Idempotence / exactly-once** (ref claim README.md:107-111): `commit`
  *   records the batchId; replaying a batch with id <= last committed is a
  *   no-op, so checkpoint-restart after a crash converges (T2).
  * - **Scale**: snapshots are plain parquet dirs — partitioned, predicate-
  *   pushdown-friendly, readable by any engine. On a real cluster `root`
  *   is an object-store prefix and `_CURRENT` swap becomes a conditional
  *   PUT; the layout is unchanged.
  */
final class SnapshotStore(val root: String, spark: SparkSession) {
  private val currentFile = Paths.get(root, "_CURRENT")

  /** (version, lastBatchId, streamId) from the manifest, if the table
    * exists. The streamId scopes batch-replay detection to one checkpoint
    * lineage (Delta's txnAppId+txnVersion idea): a stream restarted with a
    * FRESH checkpoint gets fresh batch ids, which must not be mistaken for
    * replays of the old lineage.
    */
  def currentFull: Option[(Long, Long, String)] =
    if (!Files.exists(currentFile)) None
    else Files.readString(currentFile).trim.split(",", 3) match {
      case Array(v, b, sid) => Some((v.toLong, b.toLong, sid))
      case Array(v, b)      => Some((v.toLong, b.toLong, "default"))
      case _                => None
    }

  def current: Option[(Long, Long)] = currentFull.map(c => (c._1, c._2))

  def exists: Boolean = current.isDefined

  def read(): Option[DataFrame] =
    current.map { case (v, _) => spark.read.parquet(s"$root/v_$v") }

  /** Read a specific RETAINED version — the commit keeps the current and
    * previous versions (older ones are reaped for space), so the retained
    * pair can feed [[ChangeFeed.diff]]: re-derive the changelog between
    * two snapshot versions without the original stream history.
    *
    * Resolution goes through the `_CURRENT` manifest, same as [[read]]: a
    * crash between the parquet write and the manifest swap leaves a
    * dangling `v_<n+1>` dir, and a bare directory probe would serve that
    * uncommitted (possibly half-written) data.
    */
  def readVersion(v: Long): Option[DataFrame] = current.flatMap { case (cur, _) =>
    if ((v == cur || v == cur - 1) && Files.isDirectory(Paths.get(s"$root/v_$v")))
      Some(spark.read.parquet(s"$root/v_$v"))
    else None
  }

  /** Write `df` as the next snapshot version and swap `_CURRENT` atomically.
    * Returns false (no-op) if `batchId` was already applied BY THE SAME
    * stream lineage (`streamId`).
    */
  def commit(df: DataFrame, batchId: Long, streamId: String = "default"): Boolean = {
    val cur = currentFull
    if (cur.exists(c => c._3 == streamId && c._2 >= batchId)) return false
    val next = cur.map(_._1 + 1).getOrElse(0L)
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/v_$next")
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "_CURRENT.tmp")
    Files.write(tmp, s"$next,$batchId,$streamId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // retain previous version for concurrent readers; reap older ones
    current.foreach { case (v, _) => reapBefore(v - 1) }
    true
  }

  /** Compact the current version's small files into ~`targetBytes` files,
    * committed as a new version with IDENTICAL content and the SAME
    * (batchId, streamId) — compaction is table maintenance, not a data
    * change, so batch-replay idempotence is untouched.
    *
    * Why it exists: a per-trigger stream commit writes batch-sized files;
    * after thousands of triggers a 100 TB table scan pays one task + one
    * footer read per tiny file. Rewriting through `coalesce` (not
    * `repartition`) merges files WITHOUT a shuffle — each output task
    * streams a handful of input files — so compaction cost is one linear
    * read+write of the live data.
    *
    * Returns the new version, or None if the table is missing or already
    * at or below the target file count (no pointless rewrite). With
    * `zorderBy` set the rewrite always proceeds — clustering, not file
    * count, is the goal there — except that an empty version (or all-null
    * cluster columns) falls back to the plain coalesce rewrite.
    */
  def compact(targetBytes: Long = 128L * 1024 * 1024,
              /** (longCol, doubleCol, bits): additionally CLUSTER the
                * rewrite by the Z-value of the two columns (the OPTIMIZE
                * ZORDER role) — each output file then holds a tight
                * min/max box in both dimensions, so post-compaction scans
                * with two-column predicates prune on parquet footer stats
                * ([[graft.ops.Layout]]). Range boundaries come from
                * Spark's sampler, so the layout (not the content) varies
                * run to run — content losslessness is what the round-trip
                * gate checks.
                */
              zorderBy: Option[(String, String, Int)] = None): Option[Long] =
    currentFull.flatMap { case (v, batchId, streamId) =>
      val dir = Paths.get(s"$root/v_$v")
      val parts = {
        val s = Files.list(dir)
        try s.filter(p => p.getFileName.toString.endsWith(".parquet")).toArray.toSeq
          .map(_.asInstanceOf[java.nio.file.Path])
        finally s.close()
      }
      val bytes = parts.map(Files.size).sum
      val target = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (target >= parts.size && zorderBy.isEmpty) None
      else {
        val next = v + 1
        val df = spark.read.parquet(dir.toString)
        val rewritten = zorderBy.flatMap { case (longCol, doubleCol, bits) =>
          import graft.ops.Layout
          import org.apache.spark.sql.functions.{col, min => fmin, max => fmax}
          val r = df.agg(fmin(col(longCol)), fmax(col(longCol)),
            fmin(col(doubleCol)), fmax(col(doubleCol))).head()
          // an empty version (or all-null cluster columns) has nothing to
          // cluster — fall back to the plain coalesce rewrite
          if (r.isNullAt(0) || r.isNullAt(2)) None
          else {
            val z = Layout.interleaveBits(
              Layout.binLong(longCol, r.getLong(0), r.getLong(1), bits),
              Layout.binDouble(col(doubleCol), r.getDouble(2), r.getDouble(3), bits),
              bits)
            Some(df.withColumn("_z", z)
              .repartitionByRange(target, col("_z"))
              .sortWithinPartitions("_z")
              .drop("_z"))
          }
        }.getOrElse(df.coalesce(target))
        rewritten.write.mode(SaveMode.Overwrite).parquet(s"$root/v_$next")
        val tmp = Paths.get(root, "_CURRENT.tmp")
        Files.write(tmp, s"$next,$batchId,$streamId".getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        reapBefore(next - 1)
        Some(next)
      }
    }

  private def reapBefore(keepFrom: Long): Unit = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return
    val vs = Files.list(dir)
    try {
      vs.filter(p => p.getFileName.toString.startsWith("v_"))
        .filter(p => p.getFileName.toString.stripPrefix("v_").toLong < keepFrom)
        .forEach(deleteRecursively)
    } finally vs.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
