package graft

/** Dev profiling harness (optimization rounds): run named queries once
  * warm, then once instrumented, and print per-run Spark JOB/stage/task
  * counts and the job wall-time histogram — separates "3 stages of real
  * compute" from "40 scheduler round-trips of fixed overhead", which is
  * the first question guide §1 asks of every slow query at bench scale.
  * Not part of the driver contract — local iteration only.
  *
  * Run: sbt "runMain graft.DevProfile q1 q2 ..."
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    Verify.muteAdvisoryWarns()
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq

    @volatile var jobs = List.empty[(Int, Long, Long, String)] // id, t0, t1, desc
    @volatile var stages = 0
    @volatile var tasks = 0
    val verbose = sys.env.get("SPARK_GRAFT_PROF_JOBS").contains("1")
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val starts =
        new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name.take(60)))
          .getOrElse("?")
        starts.put(e.jobId, (e.time, d))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = Option(starts.get(e.jobId)).getOrElse((e.time, "?"))
        jobs synchronized { jobs = (e.jobId, t0, e.time, d) :: jobs }
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += e.stageInfo.numTasks
      }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warmup at the target SF (scratch stores built, JIT paid)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      jobs = Nil; stages = 0; tasks = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // drain the listener bus so late events land before we read counters
      Thread.sleep(300)
      val js = jobs.sortBy(_._1)
      val durs = js.map { case (_, a, b, _) => (b - a).toDouble } // ms
      val jsum = durs.sum / 1e3 // s
      println(f"[prof] $n%-28s wall=$el%6.2f jobs=${js.size}%3d jobsum=$jsum%6.2f " +
        f"stages=$stages%3d tasks=$tasks%5d " +
        f"top5=${durs.sorted.reverse.take(5).map(d => f"$d%.0f").mkString(",")}ms")
      if (verbose) js.foreach { case (id, a, b, d) =>
        println(f"  [job] #$id%3d ${b - a}%6dms  $d")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
