package graft

import graft.cdc.ManifestStore
import org.apache.spark.sql.functions._

/** Scale evidence for truncated string zone-map stats (table property
  * `stats.truncate`): on a text corpus whose zone map tracks the document
  * column — the LLM-pipeline shape — full min/max stats store two
  * document-sized strings per file, so the manifest checkpoint grows with
  * DOCUMENT size, not file count, and every cold planning pass parses it.
  * Truncation caps the per-file stat cost at O(N) bytes while keeping
  * every pruning consumer sound (widened bounds over-keep).
  *
  * Usage: `sbt "runMain graft.TruncBench [nRows] [nFiles]"` — defaults
  * 2M rows x ~2 KB text / 512 files. Builds full/truncated twins,
  * measures the checkpoint manifest bytes, a COLD manifest load (the
  * table is renamed so the process-wide manifest LRU cannot serve it),
  * and a planning-only prefix prune on each; asserts the truncated twin
  * prunes the same files. Prints one JSON line.
  */
object TruncBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("truncbench")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // ~2 KB deterministic text per row; the sortable "doc-<id>-" prefix
    // correlates with the key so per-file text ranges are tight and a
    // prefix predicate has structure to prune on
    val df = spark.range(0L, n).select(col("id"),
      concat(format_string("doc-%012d-", col("id")),
        repeat(md5(col("id").cast("string")), 60)).as("text"))

    def build(tag: String, trunc: Option[Int]): (String, Double) = {
      val root = s"$base/$tag"
      trunc.foreach(t => ManifestStore.writeTableProps(root,
        Map("stats.truncate" -> t.toString)))
      val st = new ManifestStore(root, spark, "id")
      val (_, t) = timed(st.commit(df, batchId = 0, nFiles = nFiles,
        statsCols = Seq("text")))
      (root, t)
    }
    val (rootF, tWriteF) = build("full", None)
    val (rootT, tWriteT) = build("trunc", Some(16))

    // manifest metadata bytes = everything under root except data/sidecar
    // files — for a single-commit table that is the version-0 checkpoint
    def metaBytes(root: String): Long = {
      val d = java.nio.file.Paths.get(root)
      val s = java.nio.file.Files.walk(d)
      try s.filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.startsWith(d.resolve("files")))
        .mapToLong(java.nio.file.Files.size).sum()
      finally s.close()
    }
    val bytesF = metaBytes(rootF)
    val bytesT = metaBytes(rootT)

    // COLD planning: rename each root (the manifest LRU keys by canonical
    // path, so the moved table parses from disk) and time load + a
    // planning-only prefix prune
    def coldPlan(root: String, tag: String): (Double, Int, Long) = {
      val moved = s"$base/cold_$tag"
      java.nio.file.Files.move(java.nio.file.Paths.get(root),
        java.nio.file.Paths.get(moved))
      val st = new ManifestStore(moved, spark, "id")
      val ((files, total), t) = timed {
        val m = st.currentManifest.get
        val lo = f"doc-${n / 2}%012d-"
        val hi = f"doc-${n / 2 + n / 100}%012d-"
        (st.readWhere("text", lo, hi).get._2.nSkipped, m.files.size)
      }
      (t, total, files.toLong)
    }
    val (tColdF, filesF, skipF) = coldPlan(rootF, "full")
    val (tColdT, filesT, skipT) = coldPlan(rootT, "trunc")
    require(filesF == nFiles && filesT == nFiles, s"$filesF/$filesT")
    // soundness + tightness: the truncated twin must skip files too, and
    // at worst a couple fewer than the exact twin on this boundary
    require(skipT > 0 && skipT >= skipF - 4,
      s"truncated twin lost pruning: full skips $skipF, trunc skips $skipT")

    println(s"""{"metric":"trunc_meta_bytes","rows":$n,"files":$nFiles,""" +
      s""""full_bytes":$bytesF,"trunc_bytes":$bytesT,""" +
      s""""ratio":${bytesF.toDouble / bytesT},""" +
      s""""cold_plan_full_s":${f"$tColdF%.3f"},""" +
      s""""cold_plan_trunc_s":${f"$tColdT%.3f"},""" +
      s""""skip_full":$skipF,"skip_trunc":$skipT,""" +
      s""""write_full_s":${f"$tWriteF%.2f"},"write_trunc_s":${f"$tWriteT%.2f"}}""")
    spark.stop()
  }
}
