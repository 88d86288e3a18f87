package graft.spark

import graft.cdc.{Changelog, ManifestStore, Merge}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ParquetWriteBridge
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.{Files, Path, Paths}

/** SQL `UPDATE` / `MERGE INTO` / subquery `DELETE` on graft tables —
  * Spark's DELTA-BASED row-level operation API (`SupportsDelta`, the same
  * contract Iceberg's merge-on-read mode implements):
  *
  *   1. Spark plans the operation as a JOIN between the target's scan
  *      (the full [[GraftScan]] — zone-map pruning, DV masking, runtime
  *      filtering all apply) and the source/condition, producing a stream
  *      of per-row verdicts: delete(id), update(id, row), insert(row).
  *      The row id is the store's KEY column — a graft table is keyed, so
  *      no positional lineage is needed.
  *   2. Executors write those verdicts as a STAGED CHANGELOG: parquet
  *      files of `(_op, _key, after-image…)` rows under the table root,
  *      via the same writer machinery `df.write.parquet` uses
  *      ([[ParquetWriteBridge]]). O(changed rows) bytes, fully
  *      distributed — the driver never holds a row.
  *   3. The driver's commit turns the staged files into a net changelog
  *      (exactly the envelope [[graft.cdc.Merge]] speaks) and applies it
  *      through [[graft.cdc.ManifestStore.mergeOptimistic]] — stats-pruned
  *      COPY-ON-WRITE against only the files whose key ranges the batch
  *      hits, under the store's optimistic CAS commit protocol.
  *
  * So a SQL MERGE INTO at 100 TB costs: one pruned scan of the target,
  * a shuffle join against the source, O(changed rows) staging I/O, and a
  * rewrite of only the touched files — the same bill Delta pays.
  *
  * Simple-predicate `DELETE FROM` never reaches this path: Spark's
  * metadata-delete optimization routes it to [[GraftTable.deleteWhere]]
  * (deletion vectors, zero rewrite) when every conjunct pushes down.
  *
  * Ref provenance: the reference's MERGE is driver-orchestrated PySpark
  * against Delta (ref: spark_client/src/cdc_stream.py:664-671); here the
  * same semantics ride Spark's own row-level rewrite planner.
  */
final class GraftRowOperationBuilder(root: String, tableSchema: StructType,
                                     options: Map[String, String], key: String,
                                     command: RowLevelOperation.Command)
  extends org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowOperation(root, tableSchema, options, key, command)
}

final class GraftRowOperation(root: String, tableSchema: StructType,
                              options: Map[String, String], key: String,
                              cmd: RowLevelOperation.Command)
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft $cmd on $root"

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
    import scala.jdk.CollectionConverters._
    new GraftScanBuilder(root, tableSchema,
      options ++ scanOptions.asScala.toMap)
  }

  override def rowId(): Array[NamedReference] = Array(Expressions.column(key))
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDeltaWriteBuilder(root, key, cmd, info, options)
}

final class GraftDeltaWriteBuilder(root: String, key: String,
                                   cmd: RowLevelOperation.Command,
                                   info: LogicalWriteInfo,
                                   options: Map[String, String])
  extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new DeltaWrite {
    override def toBatch: DeltaBatchWrite =
      new GraftDeltaBatchWrite(root, key, cmd, info, options)
  }
}

/** One staged file per non-empty write task; commit applies the staged
  * changelog through the store's optimistic merge and removes the staging
  * directory. Staging lives UNDER THE TABLE ROOT (same storage system), so
  * executor writes land where the driver's merge can read them on any
  * cluster topology.
  */
final class GraftDeltaBatchWrite(root: String, key: String,
                                 cmd: RowLevelOperation.Command,
                                 info: LogicalWriteInfo,
                                 options: Map[String, String])
  extends DeltaBatchWrite {

  /** 'mor' table property/option: commit through deletion-vector
    * MERGE-ON-READ instead of copy-on-write — a scattered statement then
    * writes O(changed rows), not O(touched files) (at 60M rows / 64
    * files a one-key-per-file MERGE is a full-table rewrite under CoW).
    * Commits run the store's OPTIMISTIC MoR protocol
    * ([[graft.cdc.ManifestStore.mergeOnReadOptimistic]] via the locked
    * wrapper): independent statements whose masks touch disjoint files
    * rebase and commute; two statements masking the same file conflict
    * and the loser retries from the winner's version — the same CAS
    * contract the CoW path has always had.
    */
  private val mor: Boolean =
    GraftTable.opt(options, "mor").exists(_.equalsIgnoreCase("true"))

  private def spark = SparkSession.active
  private val keyType: DataType = info.rowIdSchema().get().fields.head.dataType
  /** after-image columns this command carries (empty for DELETE) */
  private val rowSchema: StructType = info.schema()
  /** Every staged field except `_op` is forced NULLABLE regardless of what
    * the write query inferred: a DELETE verdict stages nulls for the whole
    * after-image, and a field the plan marked non-null (e.g. a literal in
    * a MERGE source) would make the parquet writer emit it as REQUIRED and
    * silently drop the delete rows' values — a truncated column chunk.
    */
  private val stagedSchema: StructType = StructType(
    StructField("_op", StringType, nullable = false) +:
      StructField("_key", keyType, nullable = true) +:
      rowSchema.fields.map(_.copy(nullable = true)))

  private val staging: Path = {
    val p = Paths.get(root, s"_delta_stage_${java.util.UUID.randomUUID()}")
    Files.createDirectories(p)
    p
  }

  override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DeltaWriterFactory =
    GraftDeltaWriterFactory(staging.toString,
      ParquetWriteBridge.taskWriters(spark, stagedSchema), key)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case GraftDeltaCommitMessage(path) if path.nonEmpty => path
    }
    try {
      if (files.isEmpty) return // no-op statement: nothing matched
      val st = storeForCommit()
      val cur = st.currentManifest.getOrElse(throw new IllegalStateException(
        s"no graft store at $root"))
      val tableSchema = StructType.fromDDL(cur.schemaDDL)
      val fields = tableSchema.fieldNames.toSeq
        .filterNot(_ == Merge.LastTsCol)
      val staged = spark.read.schema(stagedSchema).parquet(files: _*)
      val ts = cur.version + 1
      val net = staged.select(
        col("_key").cast("string").as(Changelog.KeyCol) +:
          col("_op").as(Changelog.OpCol) +:
          lit(ts).as(Changelog.TsCol) +:
          fields.map(f =>
            // absent fields (a DELETE's whole after-image) stage as TYPED
            // nulls — an untyped VOID column would poison the merged
            // schema when a statement carries no inserts at all
            (if (rowSchema.fieldNames.contains(f)) col(f)
             else lit(null).cast(tableSchema(f).dataType)).as(s"after_$f")): _*)
      // every SQL statement is its OWN write lineage (fresh streamId):
      // the (batchId, streamId) replay guard exists for micro-batch
      // re-delivery, and a fixed id here would make a concurrent
      // statement's commit look like a replay and silently no-op —
      // concurrency is the CAS rebase's job, not the guard's
      val lineage = s"sql-${cmd.toString.toLowerCase}-" +
        staging.getFileName.toString.stripPrefix("_delta_stage_")
      if (mor) {
        st.mergeOnReadLocked(net, fields, batchId = ts, streamId = lineage,
          tsGuard = false)
        ()
      } else st.mergeOptimistic(net, fields, batchId = ts,
        streamId = lineage, tsGuard = false) match {
        case ManifestStore.MergeConflict(v, reason) =>
          throw new IllegalStateException(
            s"graft $cmd lost the optimistic-commit race at version $v: $reason")
        case _ => ()
      }
    } finally deleteStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteStaging()

  private def storeForCommit(): ManifestStore = {
    val k = GraftTable.resolve(root, Map.empty)._2
    require(k == key, s"store key drifted: table resolved '$key', store has '$k'")
    new ManifestStore(root, spark, key)
  }

  private def deleteStaging(): Unit = {
    if (Files.isDirectory(staging)) {
      val s = Files.list(staging)
      try s.forEach(p => { Files.deleteIfExists(p); () }) finally s.close()
    }
    Files.deleteIfExists(staging)
    ()
  }
}

final case class GraftDeltaCommitMessage(path: String) extends WriterCommitMessage

/** Per-task staged-changelog writer. An insert's key rides inside its
  * after-image (`keyName` locates it); update/delete get it from the row
  * id Spark passes. Values are copied out of the incoming (buffer-reusing)
  * rows before they reach the parquet writer.
  */
final case class GraftDeltaWriterFactory(stagingDir: String,
                                         writers: ParquetWriteBridge.TaskWriters,
                                         keyName: String)
  extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stagingDir, writers, keyName, partitionId, taskId)
}

final class GraftDeltaWriter(stagingDir: String,
                             writers: ParquetWriteBridge.TaskWriters,
                             keyName: String, partitionId: Int, taskId: Long)
  extends DeltaWriter[InternalRow] {

  // staged layout: _op, _key, <row fields> (see GraftDeltaBatchWrite)
  private val staged: StructType = StructType.fromDDL(writers.schemaDDL)
  private val keyType: DataType = staged("_key").dataType
  private val fieldTypes: Array[DataType] = staged.fields.drop(2).map(_.dataType)
  private val keyOrdInRow: Int = staged.fieldNames.drop(2).indexOf(keyName)

  private var out: ParquetWriteBridge.RowFileWriter = _
  private var path: String = ""

  private def ensureOpen(): Unit = if (out == null) {
    path = s"$stagingDir/part-$partitionId-$taskId${writers.extension()}"
    out = writers.open(path, partitionId, taskId)
  }

  private val opD = UTF8String.fromString("d")
  private val opU = UTF8String.fromString("u")
  private val opC = UTF8String.fromString("c")

  private def emit(op: UTF8String, keyVal: Any, row: InternalRow): Unit = {
    ensureOpen()
    val vals = new Array[Any](2 + fieldTypes.length)
    vals(0) = op
    vals(1) = keyVal
    if (row != null) {
      val copied = row.copy()
      var i = 0
      while (i < fieldTypes.length) {
        vals(2 + i) =
          if (copied.isNullAt(i)) null else copied.get(i, fieldTypes(i))
        i += 1
      }
    }
    out.write(new GenericInternalRow(vals))
  }

  private def keyOf(id: InternalRow): Any =
    if (id.isNullAt(0)) null else id.copy().get(0, keyType)

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    emit(opD, keyOf(id), null)

  /** An UPDATE/MERGE that assigns the key column relocates the row: routed
    * by the OLD key alone it would leave a pre-existing row at the NEW key
    * untouched (its file is never pruned in), silently creating duplicate
    * keys. Split it here into delete(old) + upsert(new) — the two verdicts
    * carry DIFFERENT keys, so the net changelog keeps both, the new key's
    * file joins the pruned set, and a collision resolves as last-write-wins
    * exactly like any upsert. Same-key updates stay a single 'u'.
    */
  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    val oldKey = keyOf(id)
    val newKey =
      if (keyOrdInRow < 0 || row.isNullAt(keyOrdInRow)) null
      else row.copy().get(keyOrdInRow, keyType)
    if (sameKey(oldKey, newKey)) emit(opU, oldKey, row)
    else { emit(opD, oldKey, null); emit(opU, newKey, row) }
  }

  private def sameKey(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: org.apache.spark.sql.types.Decimal, y: org.apache.spark.sql.types.Decimal) =>
      x.compare(y) == 0
    case (x, y) => x == y // UTF8String/boxed primitives define value equality
  }

  override def insert(row: InternalRow): Unit = {
    require(keyOrdInRow >= 0,
      s"graft INSERT arm needs the key column '$keyName' in the write schema")
    val kv = if (row.isNullAt(keyOrdInRow)) null
             else row.copy().get(keyOrdInRow, keyType)
    emit(opC, kv, row)
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    GraftDeltaCommitMessage(path)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    if (path.nonEmpty) Files.deleteIfExists(Paths.get(path))
    ()
  }

  override def close(): Unit = ()
}
