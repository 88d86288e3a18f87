package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The complete MongoDB CDC path (ref: cdc_stream.py process_mongodb_batch
  * :710-904): extended-JSON envelope extraction, BSON normalization into
  * map<string,string> documents, keyed dedup, field discovery, and
  * materialization into a columnar table that conforms to the existing
  * target schema ("first writer wins", ref :852-861).
  *
  * Scale deltas vs the reference (SURVEY §3.2):
  *   - normalization is a JVM UDF, not a per-row Python worker round-trip;
  *   - field discovery aggregates map keys distributed-side and collects
  *     only the O(#fields) name list — the reference collects per batch
  *     (:808-812); we do it once at table create;
  *   - dedup/merge reuse the Postgres-path operators (one key shuffle, two
  *     broadcast snapshot passes).
  */
object MongoPipeline {

  /** Raw envelope -> deduped net changes: key, op, ts and the normalized
    * after-doc map. Key = after-doc key; for deletes the before-doc is
    * normalized ON DEMAND just to extract the key (`when` short-circuits
    * per row, so the recursive walk runs only for the delete fraction —
    * the reference normalizes every before image unconditionally,
    * cdc_stream.py:757-761).
    */
  def netChanges(raw: DataFrame, keyField: String): DataFrame = {
    val env = MongoChangelog.extractEnvelope(raw) // passes _seq through if present
      // native expression (no ScalaUDF conversion layer); registered by
      // GraftExtensions — graft.functions.BsonNormalize
      .withColumn("after_doc", call_function("bson_normalize", col("after_doc")))
      .withColumn(Changelog.KeyCol,
        when(col(Changelog.OpCol) === "d",
          element_at(call_function("bson_normalize", col("before_doc")), keyField))
          .otherwise(element_at(col("after_doc"), keyField)))
      .drop("before_doc")
      .filter(col(Changelog.OpCol).isNotNull)
    Changelog.dedupLatest(env)
  }

  /** Distinct document field names, discovered distributed-side (explode ->
    * distinct runs as a shuffle; only the tiny name list reaches the
    * driver). Key first, then sorted — a deterministic column order the
    * reference gets implicitly from first-doc iteration.
    */
  def discoverFields(net: DataFrame, keyField: String): Seq[String] = {
    val names = net.select(explode(map_keys(col("after_doc"))).as("f"))
      .distinct().collect().map(_.getString(0)).toSeq
    keyField +: names.filter(_ != keyField).sorted
  }

  /** Map-typed net changes -> flattened after_* columns in the shape
    * [[Merge.applyChanges]] consumes (all values string-typed, like the
    * reference's map<string,string> materialization :829-834).
    */
  def materialize(net: DataFrame, fields: Seq[String]): DataFrame = {
    val cols = Seq(col(Changelog.KeyCol), col(Changelog.OpCol), col(Changelog.TsCol)) ++
      fields.map(f => element_at(col("after_doc"), f).as(s"after_$f"))
    net.select(cols: _*)
  }

  /** Columns a new batch must conform to, given an existing target table
    * ("first writer wins" schema evolution, ref :852-861): fields absent in
    * the table are dropped; fields absent in the batch materialize as null.
    */
  def conformFields(snapshot: DataFrame, keyField: String): Seq[String] =
    snapshot.columns.filter(c => c != Merge.LastTsCol).toSeq

  /** One micro-batch against a snapshot store: discover-or-conform fields,
    * materialize, merge. Returns the merged frame (caller commits).
    */
  def applyBatch(spark: SparkSession, store: SnapshotStore, raw: DataFrame,
                 keyField: String, columnsToSave: Option[Seq[String]] = None,
                 tsGuard: Boolean = true, evolveSchema: Boolean = true): DataFrame =
    applyBatchWithCleanup(spark, store, raw, keyField, columnsToSave, tsGuard,
      evolveSchema)._1

  /** As [[applyBatch]] plus a cleanup thunk for the pinned intermediates —
    * streaming callers must invoke it after materialization or they leak a
    * cache entry per micro-batch.
    *
    * Schema evolution: with `evolveSchema` (default), fields first seen in
    * a later batch are APPENDED to the table — existing rows read null for
    * them — matching the Postgres path's additive drift handling; the
    * per-batch cost is the same distributed key-discovery aggregate the
    * reference pays every batch (:808-812). `evolveSchema = false` keeps
    * the reference's first-writer-wins behavior (:852-861): unknown fields
    * are dropped. `columnsToSave` bounds discovery in both modes.
    */
  def applyBatchWithCleanup(spark: SparkSession, store: SnapshotStore, raw: DataFrame,
                            keyField: String, columnsToSave: Option[Seq[String]] = None,
                            tsGuard: Boolean = true, evolveSchema: Boolean = true)
      : (DataFrame, () => Unit) = {
    // pinned: on first contact both discoverFields (a collect) and the merge
    // consume `net` — without this the UDF walk + dedup shuffle run twice
    val net = netChanges(raw, keyField)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val snapOpt = store.read()
    def allowed(discovered: Seq[String]): Seq[String] = columnsToSave match {
      // key force-included (ref :822-823)
      case Some(saved) => discovered.filter(f => saved.contains(f) || f == keyField)
      case None        => discovered
    }
    val fields = snapOpt match {
      case Some(snap) =>
        val existing = conformFields(snap, keyField)
        if (!evolveSchema) existing
        else existing ++ allowed(discoverFields(net, keyField)).filterNot(existing.contains)
      case None => allowed(discoverFields(net, keyField))
    }
    val snapshot = snapOpt.map { snap =>
      // net-new fields appear as null columns on the existing rows
      fields.filterNot(snap.columns.contains)
        .foldLeft(snap)((df, f) => df.withColumn(f, lit(null).cast("string")))
    }.getOrElse {
      val selects = fields.map(f => lit(null).cast("string").as(f)) :+
        lit(null).cast("long").as(Merge.LastTsCol)
      spark.emptyDataFrame.select(selects: _*)
    }
    val flat = materialize(net, fields)
    val (merged, mergeCleanup) =
      Merge.applyChangesWithCleanup(snapshot, flat, keyField, fields, tsGuard)
    (merged, () => { mergeCleanup(); net.unpersist() })
  }
}
