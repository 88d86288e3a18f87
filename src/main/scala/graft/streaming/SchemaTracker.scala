package graft.streaming

import graft.cdc.Envelope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-batch schema resolution shared by the streaming engines
  * ([[CdcStream]], [[ManifestCdcStream]]).
  *
  * Schema drift (SURVEY §4 hazard 6 — the reference's cache never
  * invalidates, so source DDL changes are silently ignored): every batch
  * re-reads the events' embedded schema blocks; new columns are appended to
  * the cached field list and the snapshot grows them as nulls. Removed
  * columns stay (their values go null in new events) — additive evolution,
  * no data loss.
  */
private[graft] object SchemaTracker {

  /** Resolve the batch's field list against the cached one, persisting any
    * evolution to `cacheDir`. Inference reads every DISTINCT schema block
    * in the batch (the groupBy collapses distributed-side; only one
    * exemplar string per variant reaches the driver), so a column added by
    * DDL mid-batch is seen even when the first event predates it. Events
    * without a schema block fall back to the cache.
    */
  def resolve(batch: DataFrame, cached: Option[Seq[Envelope.FieldInfo]],
              cacheDir: String): Seq[Envelope.FieldInfo] = {
    val blocks = batch
      .select(get_json_object(col("value").cast("string"), "$.schema").as("s"))
      .filter(col("s").isNotNull)
      .groupBy(md5(col("s"))).agg(first(col("s")).as("s"))
      .select("s").collect().map(_.getString(0))
    val variants = blocks.toSeq.flatMap(b =>
      scala.util.Try(Envelope.inferFieldInfo(s"""{"schema":$b}""")).toOption)
    val inferredOpt =
      if (variants.isEmpty) None
      else Some {
        // deterministic merge independent of collect order: widest block
        // is the base, remaining new fields append sorted by name
        val base = variants.maxBy(v => (v.length, v.map(_.name).mkString(",")))
        val known = base.map(_.name).toSet
        base ++ variants.flatten
          .filterNot(f => known.contains(f.name))
          .distinctBy(_.name).sortBy(_.name)
      }
    (cached, inferredOpt) match {
      case (None, Some(inferred)) =>
        Envelope.saveCache(cacheDir, inferred)
        inferred
      case (Some(c), None) => c
      case (None, None) =>
        throw new IllegalStateException(
          "no cached schema and the first event carries no schema block")
      case (Some(c), Some(inferred)) =>
        val known = c.map(_.name).toSet
        val added = inferred.filterNot(f => known.contains(f.name))
        if (added.isEmpty) c
        else {
          val evolved = c ++ added
          Envelope.saveCache(cacheDir, evolved)
          evolved
        }
    }
  }
}
