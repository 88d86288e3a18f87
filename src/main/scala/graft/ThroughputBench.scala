package graft

import graft.cdc._
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._

/** End-to-end CDC micro-batch throughput: synthesized Debezium events
  * through parse -> dedup -> ts-guarded merge -> snapshot commit, measured
  * as events/second. The reference's operating ceiling is 10,000 events per
  * 30 s trigger (~333 ev/s) on one core (BASELINE.md); this main prints the
  * same metric for this engine.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ThroughputBench"
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    // ~5x the sf's changelog by unioning key-shifted copies
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val copies = (0 until 5).map { i =>
      ChangelogGen.fromCustomerDf(
        customer.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L)))
    }
    val batch = copies.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    val nEvents = batch.count() // materialize input outside the timed span

    val storeDir = java.nio.file.Files.createTempDirectory("tp_store").toString
    val cacheDir = java.nio.file.Files.createTempDirectory("tp_cache").toString
    val store = new SnapshotStore(storeDir, spark)
    val stream = new CdcStream(spark, spark.emptyDataFrame, store, "c_custkey",
      cacheDir, checkpointDir = "/tmp/unused")

    // batch 0: cold apply onto an empty snapshot
    val t0 = System.nanoTime()
    stream.processBatch(batch, 0)
    val coldSec = (System.nanoTime() - t0) / 1e9
    // batch 1: steady-state merge against the populated snapshot
    val t1 = System.nanoTime()
    stream.processBatch(batch, 1)
    val steadySec = (System.nanoTime() - t1) / 1e9

    val snapRows = store.read().map(_.count()).getOrElse(0L)
    println(f"""{"events":$nEvents,"cold_sec":$coldSec%.2f,"steady_sec":$steadySec%.2f,"cold_ev_per_sec":${nEvents / coldSec}%.0f,"steady_ev_per_sec":${nEvents / steadySec}%.0f,"snapshot_rows":$snapRows}""")
    spark.stop()
  }
}
