package graft.spark
import graft.SparkSpec
import graft.cdc.ManifestStore
import org.apache.spark.sql.functions._
class InProbeSpec extends SparkSpec {
  test("probe in pushdown") {
    val root = java.nio.file.Files.createTempDirectory("graft_inprobe").toString + "/s"
    val st = new ManifestStore(root, spark, "id")
    st.commit(spark.range(16000).selectExpr("id", "CAST(id AS STRING) AS v"),
      batchId = 0, nFiles = 16)
    val keys = (0L until 5000L).map(java.lang.Long.valueOf)
    val df = spark.read.format("graft").load(root).filter(col("id").isin(keys: _*))
    val plan = df.queryExecution.executedPlan.toString
    println("PUSHED: " + plan.linesIterator.filter(_.contains("BatchScan")).mkString.take(400))
    println("PARTS: " + df.rdd.getNumPartitions)
    val conj = GraftScan.conjuncts(Seq(org.apache.spark.sql.sources.In("id", keys.toArray[Any])))
    println("CONJ: " + conj.map(c => (c._1, c._2, c._3.asInstanceOf[Seq[Any]].size)))
    val pf = st.prunedFiles(st.currentManifest.get, conj)
    println("PRUNED: " + pf.size + " of 16")
  }
}
