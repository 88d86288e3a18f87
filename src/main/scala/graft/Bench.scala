package graft
/** Per-round benchmark: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * timed end-to-end. Results go to the `noop` sink so the full projection is
  * evaluated (a bare `count()` would let Catalyst prune the very columns the
  * query exists to compute).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    // JMH-style warmup at a smaller SF: pays JVM/codegen JIT cost once so
    // the timed runs measure the query plans, not classloading. sf0.01 (not
    // sf0.001) so hot loops actually reach C2 compilation thresholds.
    val warmDir = "/root/testdata/sf0.01"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    spark.catalog.clearCache() // timed runs build their own state
    // best-of-3 per query: the first timed run still pays residual JIT for
    // sf-specific plan shapes, and this VM shows heavy run-to-run noise
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // teardown outside the timed span
        if (ok) elapsed else -1.0 // sentinel: a failed run must not read as fast
      }
      val good = times.filter(_ >= 0.0)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
