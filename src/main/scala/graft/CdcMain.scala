package graft

import graft.cdc.SnapshotStore
import graft.streaming._
import org.apache.spark.sql.streaming.Trigger

/** The engine's CLI entry — the Spark-native form of
  * `cdc_stream.py --config config.json` (ref main dispatch
  * cdc_stream.py:1095-1108, supervision loop :981-991, graceful shutdown
  * :992-1002):
  *
  *   runMain graft.CdcMain <config.json> [--once]
  *
  * Dispatches on `database_config.type` (postgres envelope path vs mongodb
  * extended-JSON path), wires the file-based changelog source, snapshot
  * store, schema cache and checkpoint from the config, and supervises the
  * query: when the config file changes on disk (T3 hot reload) the query is
  * stopped and recreated with the new settings. `--once` processes the
  * available backlog (Trigger.AvailableNow) and exits — the testable mode;
  * without it the stream runs on the configured processing-time trigger
  * until interrupted (shutdown hook drains the in-flight batch, T4).
  */
object CdcMain {
  def main(args: Array[String]): Unit = {
    val configPath = args.headOption.getOrElse(
      sys.error("usage: CdcMain <config.json> [--once]"))
    val once = args.contains("--once")
    val cm = new ConfigManager(configPath)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")

    @volatile var running = true
    var active: Option[(AnyRef, org.apache.spark.sql.streaming.StreamingQuery)] = None

    def makeStream(cfg: CdcConfig): (AnyRef, org.apache.spark.sql.streaming.StreamingQuery) = {
      val store = new SnapshotStore(cfg.outputPath, spark)
      val trigger =
        if (once) Trigger.AvailableNow()
        else Trigger.ProcessingTime(cfg.processTime)
      val source = CdcStream.fileSource(spark, cfg.sourceDir, cfg.maxFilesPerTrigger)
      cfg.databaseType match {
        case "mongodb" =>
          val s = new MongoCdcStream(spark, source, store, cfg.keyColumn,
            cfg.checkpointDir, cfg.columnsToSave, trigger = trigger)
          (s, s.start())
        case _ =>
          val s = new CdcStream(spark, source, store, cfg.keyColumn,
            cfg.schemaCacheDir, cfg.checkpointDir, cfg.columnsToSave,
            trigger = trigger)
          (s, s.start())
      }
    }

    def stopActive(): Unit = active.foreach {
      case (s: CdcStream, q)      => s.stopGracefully(q)
      case (s: MongoCdcStream, q) => s.stopGracefully(q)
      case (_, q)                 => q.stop()
    }

    sys.addShutdownHook { running = false; stopActive() }

    active = Some(makeStream(cm.config))
    if (once) {
      active.foreach(_._2.awaitTermination())
    } else {
      // supervision loop: poll for termination and config changes
      while (running) {
        active.foreach(_._2.awaitTermination(2000))
        if (running && cm.changed()) {
          println(s"[cdc-main] config changed; restarting query")
          stopActive()
          active = Some(makeStream(cm.config))
        }
      }
    }
    spark.stop()
  }
}
