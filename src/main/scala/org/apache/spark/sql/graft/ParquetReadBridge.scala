/*
 * The ONE file in this repository outside the `graft` namespace, and the
 * reason it lives here: Spark's per-file parquet reader factory
 * (`FileFormat.buildReaderWithPartitionValues`) — the exact machinery
 * `FileSourceScanExec` ships to executors — is `private[sql]`. Every
 * production Spark connector that reuses the built-in columnar parquet
 * reader instead of re-implementing it (Delta's `DeltaParquetFileFormat`,
 * Iceberg's Spark runtime shims) does precisely this: one bridge object
 * declared under `org.apache.spark.sql` that re-exposes the minimal
 * surface. Everything else about the graft DataSource V2 connector lives
 * in `graft.spark` and uses only public `connector.*` APIs.
 */
package org.apache.spark.sql.graft

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Serializable per-file parquet readers for the graft DSv2 connector.
  *
  * Both factories are built ON THE DRIVER (they capture a broadcast of the
  * Hadoop conf internally, exactly as `FileSourceScanExec` does) and the
  * returned closures are shipped to executors inside the partition reader
  * factory.
  */
object ParquetReadBridge {

  private def classic(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Row-at-a-time reader: vectorization is disabled on a cloned session so
    * the closure yields true `InternalRow`s (never an erased
    * `ColumnarBatch`), which the masked-file path needs for its per-row
    * deletion-vector filter. Missing columns read as nulls and lossless
    * type widenings upcast — the store's additive/widening schema
    * evolution rides on the parquet reader's own clipping.
    */
  def rowReader(spark: SparkSession, dataSchema: StructType,
                requiredSchema: StructType, filters: Seq[Filter],
                options: Map[String, String])
      : PartitionedFile => Iterator[InternalRow] = {
    val cs = classic(spark).cloneSession()
    cs.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    new ParquetFileFormat().buildReaderWithPartitionValues(
      cs, dataSchema, new StructType(), requiredSchema, filters, options,
      cs.sessionState.newHadoopConfWithOptions(options))
  }

  /** Vectorized whole-batch reader for pristine (sidecar-less) files, when
    * the projected schema supports it — the same `ColumnarBatch` path the
    * built-in parquet scan runs, so a DSv2 graft scan of an unmasked table
    * pays no reader overhead vs `spark.read.parquet`. None when the schema
    * (or session conf) rules batch reads out; callers fall back to rows.
    */
  def columnarReader(spark: SparkSession, dataSchema: StructType,
                     requiredSchema: StructType, filters: Seq[Filter],
                     options: Map[String, String])
      : Option[PartitionedFile => Iterator[ColumnarBatch]] = {
    val cs = classic(spark)
    val fmt = new ParquetFileFormat()
    if (!fmt.supportBatch(cs, requiredSchema)) None
    else {
      // Spark 4 refuses a vectorized build without this explicit contract
      val opts = options +
        (org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "true")
      val f = fmt.buildReaderWithPartitionValues(
        cs, dataSchema, new StructType(), requiredSchema, filters, opts,
        cs.sessionState.newHadoopConfWithOptions(options))
      // supportBatch == true makes buildReaderWithPartitionValues return
      // batches through the row-typed iterator (Spark's own unchecked
      // cast, see FileSourceScanExec); re-type it honestly here.
      Some(pf => f(pf).asInstanceOf[Iterator[ColumnarBatch]])
    }
  }

  /** Codegen'd projection keeping the first `take` fields of rows shaped
    * like `from` — how the masked-file reader drops the key column it had
    * to read for deletion-vector filtering when the query didn't select
    * it. Built on the EXECUTOR (codegen output is not serializable).
    * Output rows reuse the projection buffer, per the usual operator
    * contract (consumers copy when they buffer).
    */
  def prefixProjection(from: StructType, take: Int): InternalRow => InternalRow = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    val proj = UnsafeProjection.create((0 until take).map(i =>
      BoundReference(i, from(i).dataType, from(i).nullable)))
    row => proj(row)
  }

  /** Codegen'd projection splicing a CONSTANT string at ordinal `ord`
    * into rows shaped like `inner` — how the reader materializes the
    * `_file` metadata column (per-file constant, never read from
    * parquet). Built on the EXECUTOR, like [[prefixProjection]]. Output
    * rows reuse the projection buffer (consumers copy when they buffer).
    */
  def spliceProjection(inner: StructType, ord: Int,
                       value: org.apache.spark.unsafe.types.UTF8String)
      : InternalRow => InternalRow = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, UnsafeProjection}
    import org.apache.spark.sql.types.StringType
    val exprs = (0 to inner.length).map { j =>
      if (j == ord) Literal(value, StringType)
      else {
        val i = if (j < ord) j else j - 1
        BoundReference(i, inner(i).dataType, inner(i).nullable)
      }
    }
    val proj = UnsafeProjection.create(exprs)
    row => proj(row)
  }

  /** A whole-file `PartitionedFile` (no splitting: graft data files are
    * written clustered and row-group pruning inside a file is the parquet
    * reader's job).
    */
  def wholeFile(path: String, fileSize: Long, modTime: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path), 0L,
      fileSize, Array.empty, modTime, fileSize)
}
