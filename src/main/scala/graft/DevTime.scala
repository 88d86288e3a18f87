package graft

/** Dev profiling harness: time individual SparkEntry queries by name
  * (all queries when no args), N runs each, against SPARK_GRAFT_SF_DIR.
  * Not part of the driver contract — local iteration only.
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val el = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        el
      }
      println(f"$n%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}  best=${times.min}%.2f")
    }
    spark.stop()
  }
}
