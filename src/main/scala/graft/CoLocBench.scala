package graft

import graft.cdc.ManifestStore
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Storage-partitioned-join stress: two co-bucketed N-row graft tables,
  * keyed join measured WITH and WITHOUT
  * `spark.sql.sources.v2.bucketing.enabled` — the delta is the whole
  * shuffle a 100 TB fact-fact join would otherwise pay. Prints one JSON
  * line with wall times and the listener-measured shuffle write bytes.
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.CoLocBench 60000000 64"
  */
object CoLocBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(60000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    Verify.muteAdvisoryWarns()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
    })

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val wh = java.nio.file.Files.createTempDirectory("coloc_wh")
    java.nio.file.Files.createDirectories(wh.resolve("db"))
    spark.conf.set("spark.sql.catalog.colb", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.colb.warehouse", wh.toString)

    def build(tbl: String, valueExpr: String, rows: Long): Double = {
      val root = wh.resolve("db").resolve(tbl).toString
      ManifestStore.writeTableProps(root,
        Map("buckets" -> buckets.toString))
      val st = new ManifestStore(root, spark, "id")
      val (_, sec) = time {
        st.commit(spark.range(rows).selectExpr("id", valueExpr),
          batchId = 0, nFiles = buckets)
      }
      sec
    }

    val tL = build("l", "CAST(id % 1000 AS DOUBLE) AS v", n)
    val tR = build("r", "id * 2 AS w", n / 2)

    def joinCount(): Long = spark.sql(
      "SELECT count(*) FROM colb.db.l l JOIN colb.db.r r ON l.id = r.id")
      .head().getLong(0)

    def measure(spj: Boolean): (Double, Long, Long, Int) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        "SELECT count(*) FROM colb.db.l l JOIN colb.db.r r ON l.id = r.id")
      val exchanges = "ShuffleExchange|Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
      val b0 = shuffleBytes.get(); val r0 = shuffleRecords.get()
      val (cnt, sec) = time(joinCount())
      require(cnt == n / 2, s"join returned $cnt, expected ${n / 2}")
      (sec, shuffleBytes.get() - b0, shuffleRecords.get() - r0, exchanges)
    }

    // warm the page cache symmetrically, then measure both modes
    val _ = joinCount()
    val (spjSec, spjBytes, spjRecs, spjEx) = measure(spj = true)
    val (shufSec, shufBytes, shufRecs, shufEx) = measure(spj = false)

    println(s"""{"metric":"coloc_join","rows_left":$n,"rows_right":${n / 2},""" +
      s""""buckets":$buckets,"build_l_sec":${f"$tL%.1f"},"build_r_sec":${f"$tR%.1f"},""" +
      s""""spj_sec":${f"$spjSec%.1f"},"spj_shuffle_bytes":$spjBytes,""" +
      s""""spj_shuffle_records":$spjRecs,"spj_exchanges":$spjEx,""" +
      s""""shuffled_sec":${f"$shufSec%.1f"},"shuffled_bytes":$shufBytes,""" +
      s""""shuffled_records":$shufRecs,"shuffled_exchanges":$shufEx}""")
    spark.stop()
  }
}
