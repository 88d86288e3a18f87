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
  *   root/_LOG/<n>         per-commit metadata (batchId, lineage, time,
  *                         op) — the commit log behind [[history]],
  *                         [[readVersion]]/[[readAsOf]] time travel, and
  *                         [[vacuum]] (Delta's DESCRIBE HISTORY /
  *                         VERSION AS OF / VACUUM)
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
/** Outcome of an optimistic [[SnapshotStore.commitIf]] attempt. */
sealed trait CommitOutcome
/** The swap won: the table now points at `version`. */
final case class Committed(version: Long) extends CommitOutcome
/** batchId <= the lineage's last applied batch — idempotent no-op. */
case object AlreadyApplied extends CommitOutcome
/** Another writer advanced the table past the expected parent; the caller
  * must re-read, re-derive its output against the new current snapshot,
  * and retry ([[SnapshotStore.commitOptimistic]] does this loop).
  */
final case class Conflict(currentVersion: Option[Long]) extends CommitOutcome

/** One retained snapshot version, from the `_LOG` commit log.
  *
  * @param version  snapshot version number (monotonic)
  * @param batchId  streaming batch whose commit produced it (compaction
  *                 reuses its source version's batchId — maintenance, not
  *                 a data change)
  * @param streamId checkpoint lineage that wrote it
  * @param tsMillis commit wall-clock, for [[SnapshotStore.readAsOf]]
  * @param op       "commit" | "compact"
  */
final case class VersionInfo(version: Long, batchId: Long, streamId: String,
                             tsMillis: Long, op: String)

/** @param retain how many trailing versions every commit keeps on disk
  *               (current counts as one). The default 2 — current plus its
  *               parent — is what concurrent readers of a pre-swap manifest
  *               need; raise it to hold a time-travel window open, the role
  *               of Delta's `delta.deletedFileRetentionDuration`. Reads of
  *               reaped versions return None rather than failing mid-scan:
  *               resolution happens against the on-disk state up front.
  */
final class SnapshotStore(val root: String, spark: SparkSession,
                          retain: Int = 2) {
  require(retain >= 1, s"retain must be >= 1, got $retain")
  private val currentFile = Paths.get(root, "_CURRENT")

  /** Append the version's metadata to the commit log. Written BEFORE the
    * `_CURRENT` swap: a crash in between leaves a log entry for an
    * uncommitted version, which every reader ignores (resolution gates on
    * `_CURRENT`) and which the next successful writer of that version
    * number simply overwrites — same idempotence as the zombie `v_<n>` dir.
    */
  private def logVersion(v: Long, batchId: Long, streamId: String,
                         op: String): Unit = {
    val dir = Paths.get(root, "_LOG")
    Files.createDirectories(dir)
    Files.write(dir.resolve(v.toString),
      s"$v,$batchId,$streamId,${System.currentTimeMillis()},$op"
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Commit history, newest first — COMMITTED versions only (log entries
    * past `_CURRENT` are crashed-writer debris). The log is kept through
    * [[vacuum]]/auto-reap (it is O(bytes) tiny), so history stays complete
    * even after the data dirs of old versions are reclaimed; pair with
    * [[readVersion]]'s None to tell "never existed" from "reaped".
    */
  def history(): Seq[VersionInfo] = current match {
    case None => Seq.empty
    case Some((cur, _)) =>
      val dir = Paths.get(root, "_LOG")
      if (!Files.isDirectory(dir)) return Seq.empty
      val s = Files.list(dir)
      val entries =
        try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          .flatMap { p =>
            Files.readString(p).trim.split(",", 5) match {
              case Array(v, b, sid, ts, op) =>
                Some(VersionInfo(v.toLong, b.toLong, sid, ts.toLong, op))
              case _ => None
            }
          }
        finally s.close()
      entries.filter(_.version <= cur).sortBy(-_.version)
  }

  /** The latest committed version whose commit time is <= `tsMillis` —
    * Delta's `TIMESTAMP AS OF`. None when the table didn't exist at that
    * time or that version's data has been reaped past the retention
    * window.
    */
  def readAsOf(tsMillis: Long): Option[DataFrame] =
    history().find(_.tsMillis <= tsMillis).flatMap(i => readVersion(i.version))

  /** Delete version data dirs below `current - keepLast + 1` and return
    * the reaped version numbers. Explicit, coarser reclamation than the
    * per-commit auto-reap — Delta's VACUUM. `keepLast >= 1`; the current
    * version is never reclaimable. The `_LOG` entries survive so
    * [[history]] still documents the reaped commits.
    */
  def vacuum(keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    current.toSeq.flatMap { case (cur, _) =>
      val floor = cur - keepLast + 1
      val dir = Paths.get(root)
      val s = Files.list(dir)
      val victims =
        try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          .filter(p => p.getFileName.toString.startsWith("v_"))
          .map(p => (p, p.getFileName.toString.stripPrefix("v_").toLong))
          .filter(_._2 < floor)
        finally s.close()
      victims.foreach(v => deleteRecursively(v._1))
      victims.map(_._2).sorted
    }
  }

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

  /** Read a specific RETAINED version — any version still inside the
    * retention window (see the `retain` knob and [[vacuum]]), so any
    * retained pair can feed [[ChangeFeed.diff]]: re-derive the changelog
    * between two snapshot versions without the original stream history.
    * This is Delta's `VERSION AS OF`; [[readAsOf]] is `TIMESTAMP AS OF`.
    *
    * Resolution goes through the `_CURRENT` manifest, same as [[read]]: a
    * crash between the parquet write and the manifest swap leaves a
    * dangling `v_<n+1>` dir, and a bare directory probe would serve that
    * uncommitted (possibly half-written) data — hence the `v <= cur` gate.
    */
  def readVersion(v: Long): Option[DataFrame] = current.flatMap { case (cur, _) =>
    if (v <= cur && Files.isDirectory(Paths.get(s"$root/v_$v")))
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
    logVersion(next, batchId, streamId, "commit")
    val tmp = Paths.get(root, "_CURRENT.tmp")
    Files.write(tmp, s"$next,$batchId,$streamId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // keep the retention window for concurrent readers + time travel
    current.foreach { case (v, _) => reapBefore(v - (retain - 1)) }
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
        logVersion(next, batchId, streamId, "compact")
        val tmp = Paths.get(root, "_CURRENT.tmp")
        Files.write(tmp, s"$next,$batchId,$streamId".getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        reapBefore(next - (retain - 1))
        Some(next)
      }
    }

  /** Optimistic (compare-and-set) commit — the multi-writer half of
    * Delta's concurrency control that the plain [[commit]] (single-writer
    * streaming path) does not need. The expensive work — writing the
    * snapshot parquet — happens UNGUARDED to a writer-private staging dir;
    * only the validate-and-publish step (re-read `_CURRENT`, compare the
    * parent version, atomic swap) runs inside a short critical section, so
    * writers never serialize on I/O, only on the pointer swap. A writer
    * whose parent went stale gets [[Conflict]] back (its staging dir is
    * reclaimed) and must re-derive against the new snapshot — which is
    * what [[commitOptimistic]] loops for you.
    *
    * The critical section is guarded twice: a JVM monitor per store root
    * (two threads in one JVM — `FileLock` is process-scoped) and an OS
    * file lock on `_COMMIT_LOCK` (two separate JVMs). On an object store
    * the equivalent is a conditional PUT of `_CURRENT` — the layout and
    * protocol carry over unchanged.
    *
    * `expectedParent = None` means "I expect to create the table"; a
    * concurrent creator then surfaces as a conflict, not a clobber.
    */
  def commitIf(df: DataFrame, batchId: Long,
               expectedParent: Option[Long],
               streamId: String = "default"): CommitOutcome = {
    val pre = currentFull
    if (pre.exists(c => c._3 == streamId && c._2 >= batchId)) return AlreadyApplied
    if (pre.map(_._1) != expectedParent) return Conflict(pre.map(_._1))
    // expensive, contention-free: stage the snapshot under a private name
    val stage = Paths.get(root, s"_stage_${java.util.UUID.randomUUID()}")
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    try {
      SnapshotStore.withCommitLock(root) {
        val cur = currentFull
        if (cur.exists(c => c._3 == streamId && c._2 >= batchId)) AlreadyApplied
        else if (cur.map(_._1) != expectedParent) Conflict(cur.map(_._1))
        else {
          val next = cur.map(_._1 + 1).getOrElse(0L)
          val dest = Paths.get(s"$root/v_$next")
          // a v_<next> dir with _CURRENT still at the parent is a zombie
          // from a crashed pre-CAS writer — definitionally uncommitted
          deleteRecursively(dest)
          Files.move(stage, dest, StandardCopyOption.ATOMIC_MOVE)
          logVersion(next, batchId, streamId, "commit")
          val tmp = Paths.get(root, "_CURRENT.tmp")
          Files.write(tmp, s"$next,$batchId,$streamId".getBytes(StandardCharsets.UTF_8))
          Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          reapBefore(next - (retain - 1))
          Committed(next)
        }
      }
    } finally deleteRecursively(stage) // no-op for the winner (already moved)
  }

  /** Retry loop over [[commitIf]]: `derive` receives the CURRENT snapshot
    * (None when the table doesn't exist yet) and returns the full next
    * table; on [[Conflict]] it is re-invoked against the newly-read state,
    * exactly like a Delta MERGE re-running its join after a concurrent
    * commit. Returns the final outcome — [[Conflict]] only if
    * `maxAttempts` successive CAS attempts all lost.
    */
  def commitOptimistic(batchId: Long, streamId: String = "default",
                       maxAttempts: Int = 3)
                      (derive: Option[DataFrame] => DataFrame): CommitOutcome = {
    var attempt = 0
    var out: CommitOutcome = Conflict(current.map(_._1))
    while (attempt < maxAttempts) {
      attempt += 1
      val parent = current.map(_._1)
      out = commitIf(derive(read()), batchId, parent, streamId)
      out match {
        case Conflict(_) => () // stale parent — loop re-reads and re-derives
        case done        => return done
      }
    }
    out
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

object SnapshotStore {
  // one monitor per store root: FileLock is PROCESS-scoped (a second
  // thread in the same JVM gets OverlappingFileLockException, not
  // blocking), so same-JVM writers serialize on this monitor and the file
  // lock below only arbitrates across processes
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // roots whose commit lock THIS thread already holds: JVM FileLock is not
  // reentrant (a nested lock() on the same file throws
  // OverlappingFileLockException), so a caller composing two locked
  // operations on one root re-enters the body directly
  private val held = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  private[graft] def withCommitLock[A](root: String)(body: => A): A =
    if (held.get()(root)) body
    else {
      val mon = monitors.computeIfAbsent(root, _ => new Object)
      mon.synchronized {
        Files.createDirectories(Paths.get(root))
        val ch = java.nio.channels.FileChannel.open(
          Paths.get(root, "_COMMIT_LOCK"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = ch.lock()
          held.set(held.get() + root)
          try body finally {
            held.set(held.get() - root)
            lock.release()
          }
        } finally ch.close()
      }
    }
}
