package graft.spark

import graft.cdc.ManifestStore
import org.apache.spark.sql.SparkSession

/** Opt-in maintenance window for streaming ingest — auto-compaction
  * (table property `autocompact.files=N`) and snapshot retention
  * (`retention.versions=N` [+ `retention.minagems`], which runs
  * `vacuum(keepLast = N)` in the same off-thread window; tagged versions
  * stay pinned regardless). Every sink epoch commits files, and at
  * production trigger rates the accreting small files are the classic
  * ingest killer — `CALL graft.system.optimize` exists but only by hand.
  * After each epoch commit the sink asks this scheduler to probe the
  * manifest (driver metadata only, served by the manifest LRU); when a
  * partition cell / bucket / the table holds more than N live files, a
  * bin-pack folds into the NEXT maintenance window: a single daemon
  * worker thread, NEVER inline on the ingest path — the epoch's commit
  * latency is untouched, and the store's CAS makes a compaction that
  * races the next epoch lose cleanly (the sink's optimistic merge
  * rebases and retries; the compaction side just returns None).
  *
  * Scoping: partitioned tables compact ONLY the offending cells
  * (`optimize(scope = cell)` — out-of-scope files carry by reference, so
  * a hot ingest partition never triggers a table-wide rewrite at 100 TB);
  * bucketed tables trip on any single bucket's count and compact toward
  * one file per bucket (the rewrite re-buckets through the clustering
  * writer, preserving the SPJ invariant); unpartitioned tables compact
  * whole. At most one RUNNING pass plus one QUEUED re-probe per table
  * root — a burst of epochs coalesces into the re-probe, and because the
  * re-probe reads the manifest when it STARTS, every commit is observed
  * by some later probe (a dropped-probe scheme would leave the files of
  * epochs landing mid-pass unaccounted until the next commit).
  */
object GraftMaintenance {

  /** Per-root count of queued+running probes, capped at 2. */
  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val inFlight = new java.util.concurrent.atomic.AtomicLong(0L)
  private lazy val pool = java.util.concurrent.Executors.newSingleThreadExecutor(
    (r: Runnable) => {
      val t = new Thread(r, "graft-maintenance")
      t.setDaemon(true)
      t
    })

  /** Process-lifetime count of completed auto-compaction passes — an
    * observable for specs and forensics.
    */
  val compactions = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Process-lifetime count of maintenance-triggered FULL re-zorders
    * (clustered-table bin-boundary refreshes) — same observability role
    * as [[compactions]].
    */
  val rezorders = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Probe `root`'s manifest and, if the `autocompact.files` bound is
    * exceeded, enqueue a scoped bin-pack. O(#files) driver metadata when
    * the property is set; free otherwise. Never blocks on the compaction
    * itself.
    */
  def maybeSchedule(root: String, spark: SparkSession, key: String): Unit = {
    val props = ManifestStore.readTableProps(root)
    val bound = props.get("autocompact.files").flatMap(_.toIntOption)
      .filter(_ > 0)
    // retention.versions=N: the same maintenance window also runs
    // vacuum(keepLast = N) — tagged versions stay pinned regardless, so
    // "keep the last N plus every tag" is the combined retention policy
    val keep = props.get("retention.versions").flatMap(_.toIntOption)
      .filter(_ >= 1)
    // clustered tables additionally refresh their bin boundaries: the
    // incremental fold rank-bins over the DIRTY subset, so repeated folds
    // drift from table-wide boundaries and box-prune tightness decays —
    // once the fold-written file fraction passes the threshold, a FULL
    // re-zorder runs in the same off-thread, CAS'd window. Active inside
    // an autocompact/retention window by default (ratio 0.5); an explicit
    // clustering.refreshratio opens the window on its own, and off/false
    // disables the trigger.
    val zRefreshOpen = zRefreshRatio(props).isDefined &&
      (bound.nonEmpty || keep.nonEmpty ||
        props.contains("clustering.refreshratio"))
    if (bound.isEmpty && keep.isEmpty && !zRefreshOpen) return
    val rootKey = java.nio.file.Paths.get(root)
      .toAbsolutePath.normalize.toString
    val n = slots.compute(rootKey, (_, v) => if (v == null) 1 else v + 1)
    if (n > 2) { // one running + one queued: this commit is already covered
      slots.compute(rootKey, (_, v) => v - 1)
      return
    }
    inFlight.incrementAndGet()
    pool.submit(new Runnable {
      override def run(): Unit =
        try {
          bound.foreach(b => compactIfNeeded(root, spark, key, b, props))
          if (zRefreshOpen) rezorderIfStale(root, spark, key)
          keep.foreach { k =>
            // minAge guards LIVE writers: vacuum reaps stage dirs and
            // unreferenced files older than the cutoff, and an in-flight
            // epoch's staging is exactly that at minAge=0 (observed: the
            // reaper deleted a task's staged parquet mid-commit). Default
            // 10 min — far above any epoch's derivation time; override
            // via retention.minagems only with slower-than-that writers
            // in mind
            new ManifestStore(root, spark, key).vacuum(keepLast = k,
              minAgeMillis = props.get("retention.minagems")
                .flatMap(_.toLongOption).getOrElse(600000L))
            ()
          }
        }
        catch { case _: Throwable => () } // lost CAS / vanished table: next epoch re-probes
        finally {
          slots.compute(rootKey, (_, v) => if (v <= 1) null else v - 1)
          inFlight.decrementAndGet()
          ()
        }
    })
    ()
  }

  /** The clustered-refresh threshold for `props`, or None when the table
    * is not rank-clustered / the trigger is disabled. Partitioned and
    * bucketed layouts never z-refresh (purity owns their file shape —
    * the same guard as [[ManifestStore.optimize]]'s clustered branch).
    */
  private def zRefreshRatio(props: Map[String, String]): Option[Double] = {
    val zc = props.get("clustering.cols").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val parted = props.get("partitioncol").exists(_.trim.nonEmpty)
    val bucketed = props.get("buckets").flatMap(_.toIntOption).exists(_ > 0)
    if (zc.size < 2 || parted || bucketed) None
    else props.get("clustering.refreshratio") match {
      case Some(v) if v.equalsIgnoreCase("off") ||
        v.equalsIgnoreCase("false") => None
      case Some(v) => v.toDoubleOption.filter(_ > 0)
      case None => Some(0.5)
    }
  }

  /** FULL re-zorder when the fold-drift counter says the incremental
    * maintenance folds have rewritten `ratio` of the table with
    * dirty-subset bin boundaries. Re-reads props (the fold bumps
    * `clustering.foldfiles` under the commit lock after the caller's
    * snapshot) and keeps the current file-count granularity. A lost CAS
    * just returns None — the counter survives and the next window
    * re-probes.
    */
  private def rezorderIfStale(root: String, spark: SparkSession,
                              key: String): Unit = {
    spark.sparkContext.setJobGroup("graft-maintenance",
      s"clustered-refresh probe: $root", interruptOnCancel = false)
    val props = ManifestStore.readTableProps(root)
    val ratio = zRefreshRatio(props).getOrElse(return)
    val folded = props.get("clustering.foldfiles")
      .flatMap(_.toLongOption).getOrElse(0L)
    if (folded <= 0L) return
    // r15: gate on MEASURED tightness decay when the fold recorded it
    // (clustering.folddebt, [[ManifestStore]] foldDebt accrual) — N
    // re-folds of the same already-tight files accrue ~0 debt and never
    // trip a spurious full rewrite, while dirty-subset boundary drift
    // (table-wide hulls) accrues ~1 per file and still does. Pre-r15
    // tables (foldfiles > 0, no recorded debt) keep the count gate.
    val staleness = props.get("clustering.folddebt")
      .flatMap(_.toDoubleOption).getOrElse(folded.toDouble)
    val st = new ManifestStore(root, spark, key)
    val m = st.currentManifest.getOrElse(return)
    if (staleness / math.max(1, m.files.size) < ratio) return
    val zc = props("clustering.cols").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    val bits = props.get("clustering.bits").flatMap(_.toIntOption)
      .filter(_ > 0).getOrElse(8)
    if (st.reclusterZorderCols(zc, nFiles = math.max(1, m.files.size),
        bits = bits).isDefined) {
      rezorders.incrementAndGet()
      ()
    }
  }

  private def compactIfNeeded(root: String, spark: SparkSession, key: String,
                              bound: Int, props: Map[String, String]): Unit = {
    // the pool thread is created lazily from a sink-commit thread and
    // INHERITS its job group (SparkContext localProperties are
    // InheritableThreadLocal) — without its own group, stopping the
    // triggering stream would cancel an in-flight compaction's jobs
    spark.sparkContext.setJobGroup("graft-maintenance",
      s"auto-compaction probe: $root", interruptOnCancel = false)
    val st = new ManifestStore(root, spark, key)
    val m = st.currentManifest.getOrElse(return)
    val partCols: Seq[String] = props.get("partitioncol").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val buckets = props.get("buckets").flatMap(_.toIntOption).filter(_ > 0)
    if (partCols.nonEmpty) {
      // per-cell file counts from the manifest's partition stats; only
      // partition-PURE files (min = max on every partition column — the
      // layout invariant the writer enforces) count toward a cell, so a
      // pre-vintage mixed file can never trip a spurious table-wide pass
      val cells = m.files.flatMap { f =>
        val cell = partCols.map(pc => f.cols.get(m.phys(pc)))
        if (cell.forall(_.exists(c => c._1 == c._2)))
          Some(partCols.zip(cell.map(_.get._1)) -> f)
        else None
      }.groupBy(_._1)
      cells.foreach { case (cellKey, files) =>
        if (files.size > bound) {
          st.optimize(targetFiles = math.max(1, bound / 4),
            scope = cellKey.map { case (c, v) => (c, v: Any) })
          compactions.incrementAndGet()
          ()
        }
      }
    } else if (buckets.exists(n =>
        m.files.groupBy(_.bucket).valuesIterator.exists(_.size > bound) ||
          m.files.size > n.toLong * bound)) {
      // bucketed: any single bucket past the bound (or unbucketed debt
      // accreting past N per bucket) re-packs toward one file per bucket;
      // the rewrite re-buckets through the clustering writer
      st.optimize(targetFiles = buckets.get)
      compactions.incrementAndGet()
      ()
    } else if (buckets.isEmpty && m.files.size > bound) {
      // unpartitioned: pack the whole table toward bound/2 so the next
      // epochs have headroom before the next pass trips
      st.optimize(targetFiles = math.max(1, bound / 2))
      compactions.incrementAndGet()
      ()
    }
  }

  /** Test hook: wait for every queued probe/compaction to finish. */
  def drain(timeoutMs: Long = 120000L): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (inFlight.get() > 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    inFlight.get() == 0
  }
}
