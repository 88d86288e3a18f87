package graft

import graft.cdc.ManifestStore
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Write-amplification evidence for the DSv2 1x-write promotion
  * ([[graft.spark.ClusteredStaging]]): a dynamic partition overwrite
  * through SQL used to stage task parquet AND re-write it through the
  * store's clustering writer (2x write I/O per statement); the promoted
  * path adopts the staged files by rename. This bench runs the SAME
  * logical overwrite both ways (`spark.graft.write.promote` on/off) on a
  * date-partitioned table and reports, per run:
  *
  *   - wall seconds
  *   - wchar/rchar deltas from /proc/self/io — every byte the JVM wrote/
  *     read at the VFS layer (parquet staging, final files, shuffle);
  *     the honest total regardless of which writer reported metrics
  *   - Spark's task shuffle-write + output bytes (listener), for the
  *     metric split
  *   - the partition's final manifest bytes (the 1x reference)
  *
  * Usage: `sbt "runMain graft.WriteAmpBench [nRows] [nParts]"` —
  * defaults 60M / 64 (the STRESS.md ladder scale). Prints one JSON line
  * per measured statement.
  */
object WriteAmpBench {
  private def procIo(): Map[String, Long] =
    scala.io.Source.fromFile("/proc/self/io").getLines().flatMap { l =>
      l.split(":\\s*") match {
        case Array(k, v) => Some(k -> v.toLong)
        case _           => None
      }
    }.toMap

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(60000000L)
    val parts = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    val outputW = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          outputW.addAndGet(m.outputMetrics.bytesWritten)
          ()
        }
      }
    })

    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_wab_wh_").toString
    spark.conf.set("spark.sql.catalog.wab", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wab.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wab.db")
    spark.sql("CREATE TABLE wab.db.t (id BIGINT, pday INT, name STRING, " +
      "payload STRING) PARTITIONED BY (pday) TBLPROPERTIES ('key'='id')")
    // ~256 B/row so the statement measures I/O, not job overhead
    spark.range(0L, n).select(col("id"),
      (col("id") % parts).cast("int").as("pday"),
      concat(lit("name_"), col("id")).as("name"),
      repeat(md5(col("id").cast("string")), 8).as("payload"))
      .createOrReplaceTempView("seed")
    spark.sql("INSERT INTO wab.db.t SELECT * FROM seed")
    val store = new ManifestStore(
      java.nio.file.Paths.get(warehouse, "db", "t").toString, spark, "id")

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def overwrite(target: Int, tag: String): Unit = {
      spark.sql("INSERT OVERWRITE wab.db.t SELECT id, pday, " +
        s"concat('$tag', id) AS name, payload FROM seed " +
        s"WHERE pday = $target")
      ()
    }
    // warm the page cache / codegen on a sacrificial partition
    overwrite(3, "warm_")

    def measure(mode: String, target: Int): String = {
      spark.conf.set("spark.graft.write.promote",
        if (mode == "promoted") "true" else "false")
      val io0 = procIo()
      shuffleW.set(0L); outputW.set(0L)
      val adopted0 = ManifestStore.adoptedFiles.get()
      val before = store.currentManifest.get.files.map(_.name).toSet
      val t0 = System.nanoTime()
      overwrite(target, s"${mode}_")
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener events drain asynchronously
      val io1 = procIo()
      val m = store.currentManifest.get
      val newBytes = m.files.filterNot(f => before(f.name)).map(_.bytes).sum
      val adopted = ManifestStore.adoptedFiles.get() - adopted0
      f"""{"mode":"$mode","wall_s":$wall%.2f,""" +
        s""""wchar":${io1("wchar") - io0("wchar")},""" +
        s""""rchar":${io1("rchar") - io0("rchar")},""" +
        s""""shuffle_write":${shuffleW.get()},""" +
        s""""task_output":${outputW.get()},""" +
        s""""partition_bytes":$newBytes,"adopted_files":$adopted}"""
    }

    // alternate modes over distinct partitions; repeat to expose variance
    val targets = Seq(parts / 4, parts / 3, parts / 2, parts - 5)
      .map(t => math.max(0, math.min(parts - 1, t)))
    require(targets.distinct.size == 4, s"need 4 distinct targets in $parts")
    val lines = Seq(
      measure("rewrite", targets(0)), measure("promoted", targets(1)),
      measure("rewrite", targets(2)), measure("promoted", targets(3)))
    lines.foreach(println)
    spark.stop()
  }
}
