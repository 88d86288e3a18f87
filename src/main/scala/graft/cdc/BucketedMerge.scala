package graft.cdc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Selective-bucket merge: the [[Merge]] semantics applied through a
  * [[BucketedSnapshotStore]], reading and rewriting ONLY the buckets the
  * batch touches.
  *
  * Per micro-batch:
  *   1. touched = distinct bucket ids of the net-change keys (driver-side
  *      metadata, <= numBuckets ints — never row data);
  *   2. snapshot slice = just those buckets' current files;
  *   3. ts-guarded merge of the slice (broadcast batch side, slice streams);
  *   4. commit new versions for touched buckets; untouched buckets keep
  *      their files byte-for-byte.
  *
  * With B buckets and k touched, batch I/O is O(table * k / B) instead of
  * O(table) — the property that makes continuous CDC viable at 100 TB.
  */
object BucketedMerge {

  /** Apply one deduped net-change batch. Returns true if committed (false =
    * batchId already applied).
    */
  def applyBatch(spark: SparkSession, store: BucketedSnapshotStore, net: DataFrame,
                 keyField: String, fieldTypes: Seq[(String, org.apache.spark.sql.types.DataType)],
                 batchId: Long, tsGuard: Boolean = true): Boolean = {
    val netP = net.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = netP
        .select(store.bucketOf(col(Changelog.KeyCol)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) return false

      val schema = StructType(
        fieldTypes.map { case (n, t) => StructField(n, t) } :+
          StructField(Merge.LastTsCol, LongType))
      val slice = store.readBuckets(touched)
        .filter(_.columns.nonEmpty)
        .getOrElse(spark.createDataFrame(
          java.util.Collections.emptyList[Row](), schema))

      val (merged, cleanup) = Merge.applyChangesWithCleanup(
        slice, netP, keyField, fieldTypes.map(_._1), tsGuard)
      try store.commit(merged, keyField, touched, batchId)
      finally cleanup()
    } finally netP.unpersist()
  }
}
