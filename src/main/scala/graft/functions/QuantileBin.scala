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

/** A string's first 8 UTF-8 bytes as a big-endian unsigned rank, mapped
  * monotonically into DOUBLE — what lets Z-order rank-bin STRING
  * dimensions (URL/path/domain columns, exactly what LLM-pipeline users
  * cluster on) through the same `approxQuantile` + [[QuantileBin]] path
  * as numerics. The truncation is the documented locality trade: strings
  * sharing their first 8 bytes rank EQUAL and land in one bin — beyond
  * the prefix the layout preserves no order (prefix predicates and
  * range scans on the leading bytes still prune; mid-string selectivity
  * does not). Double's 53-bit mantissa keeps ~6.6 leading bytes of
  * resolution, plenty for 2^bits <= 4096 bins. Layout-only like the
  * binning itself: rank values order rows inside one rewrite and never
  * reach answers.
  */
case class StringPrefixRank(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckFailure(
        s"string_prefix_rank expects a string, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    StringPrefixRank.rank(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, vCode =>
      s"graft.functions.StringPrefixRank.rank($vCode)")

  override protected def withNewChildInternal(c: Expression): StringPrefixRank =
    copy(child = c)
  override def prettyName: String = "string_prefix_rank"
}

object StringPrefixRank {
  /** Big-endian unsigned value of the first min(8, len) bytes,
    * zero-padded, then unsigned-long -> double (monotone up to double
    * rounding — consistent on both the data and boundary sides, which is
    * all equi-depth binning needs).
    */
  def rank(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val n = math.min(8, s.numBytes())
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (s.getByte(i) & 0xffL); i += 1 }
    v <<= 8 * (8 - n)
    if (v >= 0L) v.toDouble else (v >>> 1).toDouble * 2.0 + (v & 1L)
  }
}
