package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Rank (quantile) binning for Z-order clustering: map a double to the
  * index of the quantile interval it falls in, by binary search over the
  * PRECOMPUTED boundary array (the column's 2^bits - 1 approximate
  * quantiles — O(#bins) driver values from one `approxQuantile` pass).
  *
  * Equi-DEPTH bins are what make multi-column Z-values work on skewed
  * data: equi-width binning from global [min, max] (the 2-column
  * [[graft.ops.Layout.binLong]] path) collapses a heavy-tailed column
  * into one hot bin, and the interleaved value degenerates to a sort on
  * the other columns — per-file zone ranges on the skewed column stay
  * table-wide. Rank binning fills every bin by construction, whatever the
  * distribution. Delta's OPTIMIZE ZORDER BY makes the same choice
  * (range_partition_id = sampled rank).
  *
  * Per row: log2(#bins) comparisons, codegen'd against a task-referenced
  * double[]. A LAYOUT expression only — bin ids order rows inside one
  * rewrite; they never reach answers, so approximate quantiles and tie
  * placement cannot affect correctness (a bad boundary set only costs
  * zone-map tightness).
  */
case class QuantileBin(child: Expression, boundaries: Seq[Double])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"quantile_bin expects a double input, got ${child.dataType.catalogString}")
    else if (boundaries.isEmpty)
      TypeCheckResult.TypeCheckFailure("quantile_bin needs >= 1 boundary")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  @transient private lazy val bounds: Array[Double] = boundaries.toArray

  override def nullSafeEval(v: Any): Any =
    QuantileBin.bin(bounds, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftQBounds", bounds, "double[]")
    defineCodeGen(ctx, ev, vCode =>
      s"graft.functions.QuantileBin.bin($ref, $vCode)")
  }

  override protected def withNewChildInternal(c: Expression): QuantileBin =
    copy(child = c)
  override def prettyName: String = "quantile_bin"
}

object QuantileBin {
  /** Bin index = number of boundaries <= v (ties land in the upper bin;
    * any consistent choice works — layout only). NaN sorts above every
    * boundary (one hot top bin for a pathological column, never a crash).
    */
  def bin(bounds: Array[Double], v: Double): Long = {
    val idx = java.util.Arrays.binarySearch(bounds, v)
    if (idx >= 0) (idx + 1).toLong else (-idx - 1).toLong
  }
}
