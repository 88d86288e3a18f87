package graft

import graft.cdc.ManifestStore
import org.apache.spark.sql.functions._

/** Scale evidence for DYNAMIC PARTITION OVERWRITE: on a date-partitioned
  * table, replacing one partition must cost O(that partition) — bytes
  * written, files touched, wall time — while every other partition's
  * files carry by reference, and a partition-filtered read must plan only
  * the partition's files. The comparator is the naive full-table
  * recommit, the bill a non-partitioned store pays for the same logical
  * operation.
  *
  * Usage: `sbt "runMain graft.PartitionBench [nRows] [nParts]"` —
  * defaults 60M rows / 64 partitions (~0.94M rows each), the same scale
  * as STRESS.md's MoR ladder. Deterministic content (range + column
  * arithmetic). Prints one JSON line.
  */
object PartitionBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(60000000L)
    val parts = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("partbench")
    val root = s"$base/ptable"

    // ~256 B/row payload so timings measure I/O, not job overhead
    def rows(lo: Long, hi: Long, tag: String) =
      spark.range(lo, hi).select(col("id"),
        (col("id") % parts).cast("int").as("pday"),
        concat(lit(tag), col("id")).as("name"),
        repeat(md5(col("id").cast("string")), 8).as("payload"))

    ManifestStore.writeTableProps(root, Map("partitioncol" -> "pday"))
    val st = new ManifestStore(root, spark, "id")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (_, tLoad) = timed {
      st.commit(rows(0L, n, "name_"), batchId = 0, nFiles = 2 * parts,
        statsCols = Seq("pday"))
    }
    val m0 = st.currentManifest.get
    val bytes0 = m0.files.map(_.bytes).sum

    // replace ONE partition with regenerated rows (same ids, new content)
    val target = math.min(17, parts - 1)
    val repl = rows(0L, n, "repl_").filter(col("pday") === target)
    val (_, tOverwrite) = timed {
      st.overwritePartitions(repl, batchId = 1, nFiles = 2)
    }
    val m1 = st.currentManifest.get
    val carried = m1.files.map(_.name).toSet
      .intersect(m0.files.map(_.name).toSet).size
    val newBytes = m1.files.filterNot(f =>
      m0.files.exists(_.name == f.name)).map(_.bytes).sum

    // partition-filtered read: planned files vs total (zone-map pruning)
    val scan = spark.read.format("graft").load(root)
      .filter(col("pday") === target)
    val plannedParts = scan.rdd.getNumPartitions
    val (cnt, tRead) = timed(scan.count())

    // the naive comparator: full-table recommit of the same logical state
    val (_, tNaive) = timed {
      val st2 = new ManifestStore(s"$base/naive", spark, "id")
      st2.commit(
        rows(0L, n, "name_").filter(col("pday") =!= target)
          .unionByName(repl),
        batchId = 0, nFiles = 2 * parts)
    }

    println(
      s"""{"bench":"partition_overwrite","rows":$n,"parts":$parts,""" +
      s""""load_sec":${f"$tLoad%.1f"},"table_mb":${bytes0 / 1000000},""" +
      s""""overwrite_sec":${f"$tOverwrite%.1f"},""" +
      s""""overwrite_new_mb":${newBytes / 1000000},""" +
      s""""files_total":${m1.files.size},"files_carried":$carried,""" +
      s""""pruned_scan_files":$plannedParts,""" +
      s""""pruned_read_sec":${f"$tRead%.1f"},"pruned_rows":$cnt,""" +
      s""""naive_recommit_sec":${f"$tNaive%.1f"}}""")
    spark.stop()
  }
}
