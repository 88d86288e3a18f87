package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed MERGE semantics (upsert + delete) without Delta Lake.
  *
  * The reference drives Delta's `MERGE` (update-matched / insert-unmatched,
  * ref: cdc_stream.py:664-671, delete-matched :686-689). Re-expressed with
  * core Spark relational algebra:
  *
  *   kept    = snapshot ANTI JOIN touched-keys        (rows not in the batch)
  *   applied = after-images of net upserts (ts-guarded against regressions)
  *   result  = kept UNION ALL applied
  *
  * Scale notes: the net-change side of a micro-batch is small relative to the
  * snapshot, so both the anti-join and the ts-guard join broadcast the batch
  * side (hinted explicitly; AQE would also pick it). The snapshot is never
  * shuffled — each of its partitions streams through a broadcast hash join.
  * Deliberate semantic fixes over the reference (SURVEY §4):
  *   - `r` (snapshot read) events upsert like `c` (ref drops them),
  *   - stale cross-batch events cannot regress state (ts guard,
  *     `source.ts >= target.ts`; ref updates unconditionally).
  */
object Merge {
  val LastTsCol = "last_ts"

  /** Apply net per-key changes (output of [[Changelog.dedupLatest]]) to a
    * keyed snapshot. `snapshot` columns: `fields` (+ optional `last_ts`);
    * result columns: `fields` :+ `last_ts`.
    */
  def applyChanges(snapshot: DataFrame, net: DataFrame, keyField: String,
                   fields: Seq[String], tsGuard: Boolean = true): DataFrame = {
    val snap =
      if (snapshot.columns.contains(LastTsCol)) snapshot
      else snapshot.withColumn(LastTsCol, lit(null).cast("long"))

    // upserts: c, u and r all materialize the after image (fix: ref drops 'r')
    val upserts = Changelog.afterImage(net.filter(col(Changelog.OpCol) =!= "d"), fields)

    val applied =
      if (tsGuard) {
        // Current ts of the touched keys only: semi-reduce the (huge) snapshot
        // by broadcasting the (small) batch keys — the snapshot side streams,
        // nothing big shuffles, and the result is at most batch-sized.
        val curTs = snap
          .join(broadcast(upserts.select(col(keyField))), Seq(keyField), "left_semi")
          .select(col(keyField).as("_k"), col(LastTsCol).as("_cur_ts"))
        upserts.join(broadcast(curTs), upserts(keyField) === col("_k"), "left")
          .filter(col("_cur_ts").isNull || col(LastTsCol) >= col("_cur_ts"))
          .drop("_k", "_cur_ts")
      } else upserts

    // every key the batch touches leaves the snapshot; guarded upserts re-enter
    val touched =
      if (tsGuard) {
        val stale = upserts.select(col(keyField)).exceptAll(applied.select(col(keyField)))
        net.select(col(Changelog.KeyCol).as(keyField)).exceptAll(stale)
      } else net.select(col(Changelog.KeyCol).as(keyField))

    val kept = snap.join(broadcast(touched), Seq(keyField), "left_anti")
    kept.unionByName(applied.select(kept.columns.map(col).toSeq: _*))
  }

  /** K5: idempotent insert-only merge (ref: archive/...stable_v3.py:343-346)
    * — insert rows whose key is absent, leave everything else untouched.
    */
  def insertOnly(snapshot: DataFrame, rows: DataFrame, keyField: String): DataFrame =
    snapshot.unionByName(
      rows.join(broadcast(snapshot.select(keyField)), Seq(keyField), "left_anti"),
      allowMissingColumns = true)
}
