package graft

import graft.cdc.ManifestStore

import java.nio.file.{Files, Paths}

/** What does reclaiming a large dead-file backlog cost? Vacuum's unlinks
  * were a serial driver loop — O(dead files) round-trips, a non-cost on
  * local FS but the dominant term on an object store. This bench times
  * the SAME `nDead`-orphan reclaim twice: the serial loop
  * (`-Dgraft.vacuum.serial=true`, the pre-r14 shape) vs the bounded
  * deletion pool, and checks both reap the identical set. Orphans are
  * synthetic 8 KiB blobs in `files/` (unreferenced by any manifest —
  * exactly what a crashed writer or an aged-out version leaves), plus a
  * slice of DV-shaped sidecar DIRECTORIES so the recursive path is
  * exercised.
  *
  * Usage: `sbt "runMain graft.VacuumBench [nDead]"` — default 10000.
  * Prints one JSON line.
  */
object VacuumBench {
  def main(args: Array[String]): Unit = {
    val nDead = args.lift(0).map(_.toInt).getOrElse(10000)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    def leg(serial: Boolean): (Double, Int) = {
      val root = Files.createTempDirectory("graft_vac_").toString + "/store"
      val st = new ManifestStore(root, spark, "id")
      st.commit(spark.range(1000L)
        .selectExpr("id", "CAST(id AS STRING) AS name"),
        batchId = 0, nFiles = 4)
      val filesDir = Paths.get(root, "files")
      val payload = Array.fill[Byte](8192)(7)
      (0 until nDead).foreach { i =>
        if (i % 10 == 9) { // every 10th dead artifact is a sidecar DIR
          val d = filesDir.resolve(s"dead-$i.parquet.dv")
          Files.createDirectories(d)
          Files.write(d.resolve("part-0.parquet"), payload)
          ()
        } else {
          Files.write(filesDir.resolve(s"dead-$i.parquet"), payload)
          ()
        }
      }
      if (serial) sys.props("graft.vacuum.serial") = "true"
      else sys.props.remove("graft.vacuum.serial")
      val t0 = System.nanoTime()
      val reaped = st.vacuum(keepLast = 1)
      val sec = (System.nanoTime() - t0) / 1e9
      require(reaped.count(_.startsWith("dead-")) == nDead,
        s"expected $nDead dead artifacts reaped, got ${reaped.size}")
      (sec, reaped.size)
    }

    val (tSer, nSer) = leg(serial = true)
    val (tPool, nPool) = leg(serial = false)
    sys.props.remove("graft.vacuum.serial")

    // INJECTED-LATENCY leg (r15): local-FS unlinks are µs, so the two
    // legs above show parity — the pool's width is the win only when
    // each delete is a round-trip. Model that directly: the same
    // deleteAll machine over a delete wrapper sleeping `latMs` (the
    // object-store round-trip shape), serial vs pooled, and assert both
    // modes hit the IDENTICAL victim set.
    val latMs = 3L
    val nLat = 1200
    def latencyLeg(serial: Boolean): (Double, Set[String]) = {
      val victims = (0 until nLat).map(i => Paths.get(s"dead-lat-$i"))
      val hit = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      if (serial) sys.props("graft.vacuum.serial") = "true"
      else sys.props.remove("graft.vacuum.serial")
      val t0 = System.nanoTime()
      ManifestStore.deleteAll(victims) { p =>
        Thread.sleep(latMs); hit.add(p.toString); ()
      }
      ((System.nanoTime() - t0) / 1e9,
        scala.jdk.CollectionConverters.SetHasAsScala(hit).asScala.toSet)
    }
    val (tLatSer, setSer) = latencyLeg(serial = true)
    val (tLatPool, setPool) = latencyLeg(serial = false)
    sys.props.remove("graft.vacuum.serial")
    require(setSer == setPool && setSer.size == nLat,
      s"latency legs must reap identical sets: ${setSer.size} vs ${setPool.size}")

    println(
      s"""{"bench":"vacuum_reclaim","dead_files":$nDead,""" +
      s""""serial_sec":${f"$tSer%.3f"},"pooled_sec":${f"$tPool%.3f"},""" +
      s""""reaped_serial":$nSer,"reaped_pooled":$nPool,""" +
      s""""lat_ms":$latMs,"lat_files":$nLat,""" +
      s""""lat_serial_sec":${f"$tLatSer%.3f"},""" +
      s""""lat_pooled_sec":${f"$tLatPool%.3f"},""" +
      s""""lat_speedup":${f"${tLatSer / tLatPool}%.1f"}}""")
    spark.stop()
  }
}
