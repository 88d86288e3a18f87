package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Hot-reloading engine config (ref: spark_client/src/config_manager.py —
  * load :78-105, validation :107-128, defaults :130-175, per-batch re-read
  * of process_time cdc_stream.py:698-701).
  *
  * JSON shape mirrors the reference's sections; everything has a default so
  * a partial file is valid.
  */
final case class CdcConfig(
    keyColumn: String,
    processTime: String,
    batchSize: Int,
    columnsToSave: Option[Seq[String]],
    failOnDataLoss: Boolean,
    maxFilesPerTrigger: Option[Int],
    sourceDir: String,
    outputPath: String,
    checkpointDir: String,
    schemaCacheDir: String,
    databaseType: String)

object CdcConfig {
  val Default: CdcConfig = CdcConfig(
    keyColumn = "id",
    processTime = "1 minute",         // ref default config_manager.py:160
    batchSize = 1000,
    columnsToSave = None,
    failOnDataLoss = false,
    maxFilesPerTrigger = None,
    sourceDir = "in",
    outputPath = "out/table",
    checkpointDir = "out/_checkpoint",
    schemaCacheDir = "out/_schema",
    databaseType = "postgres")
}

final class ConfigManager(path: String) {
  // Content-hash change detection: mtime alone misses a second write landing
  // in the same millisecond (or a tool preserving mtime), and a failed parse
  // must not mask a later distinct write.
  @volatile private var lastParsedHash: String = ""
  @volatile private var lastFailedHash: String = ""
  @volatile private var cached: CdcConfig = CdcConfig.Default

  private def readWithHash(): Option[(String, String)] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else {
      val content = Files.readString(p)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      Some((content, hash))
    }
  }

  /** Current config; re-parses only when the file's content changed. A file
    * that fails to parse (torn write, bad JSON) is skipped and the previous
    * config stays in effect (ref: config_manager.py keeps the prior config
    * on a bad reload).
    */
  def config: CdcConfig = {
    readWithHash().foreach { case (content, hash) =>
      if (hash != lastParsedHash && hash != lastFailedHash) {
        try { cached = parse(content); lastParsedHash = hash; lastFailedHash = "" }
        catch { case e: Exception =>
          System.err.println(s"[config] ignoring unparseable $path: ${e.getMessage}")
          lastFailedHash = hash // remember the bad content so a fixed rewrite registers
        }
      }
    }
    cached
  }

  /** True when the file holds content not yet seen by `config` — the
    * query-restart signal (ref: cdc_stream.py:954-966 restart flag).
    */
  def changed(): Boolean =
    readWithHash().exists { case (_, hash) =>
      hash != lastParsedHash && hash != lastFailedHash
    }

  private[streaming] def parse(json: String): CdcConfig = {
    val root = new ObjectMapper().readTree(json)
    def str(sect: String, field: String, dflt: String): String = {
      val v = root.path(sect).path(field)
      if (v.isMissingNode || v.isNull) dflt else v.asText()
    }
    val d = CdcConfig.Default
    val cols = {
      val v = root.path("database_config").path("columns_to_save")
      if (v.isArray)                      // natural JSON-array form
        Some(v.elements().asScala.map(_.asText()).toSeq).filter(_.nonEmpty)
      else if (v.isMissingNode || v.isNull || v.asText().isEmpty) None
      else Some(v.asText().split(",").map(_.trim).toSeq)   // ref config.json:29
    }
    val mft = {
      val v = root.path("kafka_config").path("max_files_per_trigger")
      if (v.isMissingNode) None else Some(v.asInt())
    }
    CdcConfig(
      keyColumn = str("processing_config", "key_column", d.keyColumn),
      processTime = str("processing_config", "process_time", d.processTime),
      batchSize = root.path("processing_config").path("batch_size").asInt(d.batchSize),
      columnsToSave = cols,
      failOnDataLoss = root.path("kafka_config").path("fail_on_data_loss")
        .asBoolean(d.failOnDataLoss),
      maxFilesPerTrigger = mft,
      // file-based stand-in for kafka_config.topic (SURVEY §7.0)
      sourceDir = str("kafka_config", "source_dir", d.sourceDir),
      outputPath = str("delta_config", "output_path", d.outputPath),
      checkpointDir = str("delta_config", "checkpoint_dir", d.checkpointDir),
      schemaCacheDir = str("cache_config", "schema_path", d.schemaCacheDir),
      databaseType = str("database_config", "type", d.databaseType))
  }
}

/** T5: cron-aligned trigger periods (ref: archive croniter variants,
  * e.g. streaming_from_kafka_to_minio copy 2.py:244-293 — trigger interval
  * = cron period with a 0.8 safety margin). Supports the subset the
  * reference actually used: every-N-minutes cron expressions.
  */
object CronTrigger {
  /** "*\/5 * * * *" -> 5 minutes; "0 * * * *" -> 1 hour; "* * * * *" -> 1m.
    * Anything outside the reference's every-N-minutes/hourly shapes (e.g. a
    * fixed hour field = daily) is rejected rather than misread.
    */
  def periodSeconds(cron: String): Long = cron.trim.split("\\s+").toList match {
    case minute :: hour :: "*" :: "*" :: "*" :: Nil => minute match {
      case "*" if hour == "*"           => 60L
      case m if m.startsWith("*/") && hour == "*" =>
        m.stripPrefix("*/").toLong * 60L
      case m if m.forall(_.isDigit) && hour == "*" => 3600L // fixed minute -> hourly
      case _ =>
        throw new IllegalArgumentException(s"unsupported cron shape: $cron")
    }
    case _ => throw new IllegalArgumentException(s"not a supported 5-field cron: $cron")
  }

  /** Trigger interval with the reference's 0.8 margin. */
  def triggerMillis(cron: String, margin: Double = 0.8): Long =
    (periodSeconds(cron) * 1000 * margin).toLong
}
