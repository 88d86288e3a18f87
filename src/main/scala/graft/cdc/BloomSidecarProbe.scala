package graft.cdc

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Membership probe against a per-file Bloom SIDECAR named by a column —
  * the blob itself is loaded lazily at evaluation time through the
  * process-wide byte-bounded LRU ([[ManifestStore.loadBloom]]), NOT carried
  * in the row.
  *
  * This is what lets [[ManifestStore]]'s merge-planning file intersection
  * run range pruning and Bloom sharpening in ONE probe job (guide §1.2 /
  * §2.4: one pass over the batch keys instead of two) while keeping the
  * sidecar-I/O bound: the caller wraps this expression in a CASE branch
  * that only reaches it for (file, key) pairs that already passed the
  * range test, so a blob is only ever loaded for a file a scan would have
  * read anyway — per PAIR, which is strictly tighter than the old
  * per-phase bound. A missing/vacuumed/unreadable sidecar returns true
  * ("maybe contains"): the file keeps its range verdict, conservative as
  * ever, never a false negative.
  *
  * `left` = sidecar file name (string column), `right` = serialized probe
  * key ([[ManifestStore.statSerialize]] rendering — the exact string the
  * sidecar was built from).
  */
case class BloomSidecarContains(rootKey: String, filesDir: String,
                                left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sidecar_contains expects a string sidecar name, got ${left.dataType.catalogString}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sidecar_contains expects a string probe, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  /** Public so generated code can call it through a reference object. */
  def probeHit(name: UTF8String, v: UTF8String): Boolean =
    ManifestStore.loadBloom(rootKey,
      java.nio.file.Paths.get(filesDir), name.toString) match {
      case Some(blob) => graft.functions.BloomSketch.containsBlob(blob, v)
      case None       => true // no loadable sidecar -> cannot prune
    }

  override def nullSafeEval(name: Any, v: Any): Any =
    probeHit(name.asInstanceOf[UTF8String], v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSidecarProbe", this,
      classOf[BloomSidecarContains].getName)
    nullSafeCodeGen(ctx, ev, (nameCode, vCode) =>
      s"${ev.value} = $ref.probeHit($nameCode, $vCode);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BloomSidecarContains = copy(left = l, right = r)
  override def prettyName: String = "bloom_sidecar_contains"
}
