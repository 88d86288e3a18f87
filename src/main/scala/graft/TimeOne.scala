package graft
/** Dev tool: time ONE registered query standalone (sf0.01 warmup +
  * best-of-3 at the given sf dir) — for re-measuring a bench outlier
  * without the full suite's session noise.
  * Run: sbt "runMain graft.TimeOne <query> /root/testdata/sf0.1"
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timeone] $name best=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
