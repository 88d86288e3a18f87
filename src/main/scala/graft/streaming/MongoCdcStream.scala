package graft.streaming

import graft.cdc.{MongoPipeline, SnapshotStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming entry for the MongoDB CDC path (ref: run_mongodb_stream,
  * cdc_stream.py:1008-1093): same foreachBatch scaffold as [[CdcStream]],
  * with [[MongoPipeline.applyBatch]] as the per-batch body (extended-JSON
  * normalization, field discovery at table create, then additive schema
  * evolution — or the reference's first-writer-wins conformance with
  * `evolveSchema = false`).
  */
final class MongoCdcStream(
    spark: SparkSession,
    source: DataFrame,
    store: SnapshotStore,
    keyField: String,
    checkpointDir: String,
    columnsToSave: Option[Seq[String]] = None,
    tsGuard: Boolean = true,
    trigger: Trigger = Trigger.AvailableNow(),
    evolveSchema: Boolean = true) {

  @volatile private var batchInProgress = false
  private lazy val streamId = CdcStream.lineageId(checkpointDir)

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    batchInProgress = true
    try {
      if (batch.isEmpty) return
      val (merged, cleanup) = MongoPipeline.applyBatchWithCleanup(
        spark, store, batch, keyField, columnsToSave, tsGuard, evolveSchema)
      try store.commit(merged, batchId, streamId)
      finally cleanup()
    } finally batchInProgress = false
  }

  def start(): StreamingQuery =
    source.writeStream
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  def stopGracefully(query: StreamingQuery, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (batchInProgress && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    query.stop()
  }
}
