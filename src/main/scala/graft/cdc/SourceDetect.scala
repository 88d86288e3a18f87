package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Source-type auto-detection — the reference planned this but never merged
  * it (ref: docs/keynotetochange.txt:1-27): inspect an event's
  * `payload.source` block and dispatch postgres vs mongodb automatically
  * instead of requiring `database_config.type`.
  *
  * Detection rules (per the reference's plan): `source.connector` names the
  * Debezium connector ("postgresql" / "mongodb"); Mongo envelopes also carry
  * the replica-set field `source.rs`, which postgres never has.
  */
object SourceDetect {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Classify one raw event JSON; None when neither signature matches. */
  def detectType(json: String): Option[String] =
    scala.util.Try(mapper.readTree(json)).toOption.flatMap { root =>
      val src = root.path("payload").path("source")
      val connector = src.path("connector").asText("")
      if (connector.startsWith("postgres")) Some("postgres")
      else if (connector.startsWith("mongo")) Some("mongodb")
      else if (!src.path("rs").isMissingNode) Some("mongodb")
      else None
    }

  /** Peek at the source directory's backlog (first events of the stream) and
    * classify. A driver-side one-time config decision: samples at most
    * `sample` envelope-shaped lines (json-object prefix — preamble/junk
    * lines don't consume the budget), not the backlog. None when the dir is
    * missing/empty/unclassifiable — callers treat that as "no data yet".
    */
  def detectFromDir(spark: SparkSession, dir: String, sample: Int = 20): Option[String] =
    scala.util.Try {
      spark.read.text(dir)
        .filter(substring(ltrim(col("value")), 1, 1) === "{")
        .limit(sample)
        .collect()
        .iterator
        .map(r => detectType(r.getString(0)))
        .collectFirst { case Some(t) => t }
    }.toOption.flatten
}
