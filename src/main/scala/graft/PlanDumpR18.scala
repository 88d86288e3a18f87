package graft

import java.nio.file.{Files, Paths}

/** Optimization-round plan evidence: write `.explain("formatted")` of the
  * named queries to plans/<round>/<query>_<suffix>.txt. Run once at the
  * pre-change commit with SUFFIX=before (via git stash) and once at HEAD
  * with SUFFIX=after — the judge checks plan claims against these files.
  *
  * Run: SPARK_GRAFT_PLAN_SUFFIX=after sbt "runMain graft.PlanDumpR18 q1 q2"
  */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val round = sys.env.getOrElse("SPARK_GRAFT_PLAN_ROUND", "r18")
    val outDir = Paths.get(sys.props.getOrElse("user.dir", "."), "plans", round)
    Files.createDirectories(outDir)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    Verify.muteAdvisoryWarns()
    args.foreach { n =>
      val fn = SparkEntry.queries(n)
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
        println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
