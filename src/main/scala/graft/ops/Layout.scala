package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-ordering) — the write-side half of scan
  * pruning. Partition/file pruning on ONE column is free with a partition
  * key; queries that filter on TWO columns (user AND time, key AND value)
  * get nothing from a single-column sort: sorting by `a` scatters `b`
  * across every file, so a `b` predicate touches all of them. Interleaving
  * the bit representations of both columns (a Morton / Z-value) and
  * clustering files by that value keeps every file's min/max box TIGHT in
  * BOTH dimensions — a zone map (per-file min/max, what parquet footers
  * store) then skips most files for predicates on either column or both.
  *
  * Binning is fixed-width from the global min/max (two O(1) driver
  * scalars): deterministic and exactly mirrorable in SQL, unlike
  * sample-based range partitioning (Delta's OPTIMIZE ZORDER samples, and
  * two runs produce different layouts). Equi-width trades skew resistance
  * for reproducibility — acceptable for a layout whose worst case is
  * "some files bigger than others", not wrong answers.
  */
object Layout {
  /** Bit-interleave two pre-binned integer columns in [0, 2^bits):
    * result bit 2j is bit j of `a`, bit 2j+1 is bit j of `b`. Pure integer
    * expression tree — engine-invariant.
    */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(a, j).bitwiseAND(lit(1L)), 2 * j)
        .plus(shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ + _)

  /** N-ary Morton interleave of pre-binned long columns in [0, 2^bits):
    * result bit (n*j + k) is bit j of column k. Pure integer expression
    * tree (n·bits shift/mask/or nodes — codegen'd flat). The result must
    * fit a signed Long: n * bits <= 63.
    */
  def interleaveBitsN(bs: Seq[Column], bits: Int): Column = {
    require(bs.nonEmpty, "interleaveBitsN needs at least one column")
    require(bs.size * bits <= 63,
      s"${bs.size} cols x $bits bits = ${bs.size * bits} > 63 result bits")
    val n = bs.size
    (0 until bits).flatMap { j =>
      bs.zipWithIndex.map { case (b, k) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), n * j + k)
      }
    }.reduce(_ + _)
  }

  /** Fixed-width bin of a long column given global [lo, hi]: integer
    * arithmetic only, (x - lo) * 2^bits DIV (hi - lo + 1).
    *
    * Range precondition: (hi - lo) must fit in (63 - bits) bits, or the
    * multiply overflows Long and the bins are silently garbage — and the
    * SQL mirror overflows identically, so the oracle gate could not catch
    * it. Callers with wider domains (e.g. epoch-nano timestamps) must
    * pre-scale the column (DIV to a coarser unit) before binning.
    */
  def binLong(name: String, lo: Long, hi: Long, bits: Int): Column = {
    val range = math.subtractExact(hi, lo) // throws on Long overflow
    require(range <= (Long.MaxValue >> bits),
      s"[$lo, $hi] spans $range > 2^${63 - bits} — (x - lo) * 2^$bits would" +
        " overflow Long; pre-scale the column to a coarser unit first")
    expr(s"(($name - $lo) * ${1L << bits}) DIV ${range + 1L}")
  }

  /** Fixed-width bin of a double column: floor((x - lo) / width) clamped
    * to the top bin; per-row IEEE ops only (no accumulation), so the SQL
    * mirror evaluates bit-identically. Degenerate lo == hi collapses to
    * bin 0.
    */
  def binDouble(x: Column, lo: Double, hi: Double, bits: Int): Column =
    if (lo == hi) lit(0L)
    else least(floor((x - lit(lo)) / lit((hi - lo) / (1L << bits))),
      lit((1L << bits) - 1L)).cast("long")

  /** The zone map of a Z-ordered layout: assign every row a Z-value over
    * (longCol, doubleCol), cut the Z-range into `nFiles` equal spans (the
    * files a range-partitioned write would produce), and report each
    * file's row count and min/max box in BOTH source dimensions. The
    * tightness of those boxes IS the pruning guarantee: a predicate on
    * either column overlaps few boxes, and a reader (or parquet footer
    * consumer) skips the rest. Emitted as data so the property sits under
    * the oracle gate instead of inside a comment.
    */
  /** Pruning effectiveness of a Z-ordered layout, as data: for a
    * two-dimensional range predicate, how many of the layout's files does
    * a min/max zone map let a reader SKIP? One row: total files, files
    * whose box overlaps the predicate (must be read), files skipped, and
    * the rows inside the surviving files vs the true matching rows (the
    * false-positive read amplification). All counts are exact integers
    * over the deterministic layout, so the skip rate itself sits under
    * the oracle gate rather than in prose.
    */
  def skipEval(df: DataFrame, longCol: String, doubleCol: String,
               bits: Int, nFiles: Int,
               loL: Long, hiL: Long, loD: Double, hiD: Double): DataFrame = {
    val zm = zoneMap(df, longCol, doubleCol, bits, nFiles)
    val overlaps = col(s"max_$longCol") >= loL && col(s"min_$longCol") <= hiL &&
      col(s"max_$doubleCol") >= loD && col(s"min_$doubleCol") <= hiD
    val fileStats = zm.agg(
      count(lit(1)).as("n_files"),
      sum(when(overlaps, 1L).otherwise(0L)).as("n_read"),
      sum(when(overlaps, lit(0L)).otherwise(1L)).as("n_skipped"),
      sum(when(overlaps, col("n_rows")).otherwise(0L)).as("rows_read"))
    val trueRows = df.agg(
      sum(when(col(longCol).between(loL, hiL) &&
        col(doubleCol).between(loD, hiD), 1L).otherwise(0L)).as("rows_matching"))
    fileStats.crossJoin(trueRows)
  }

  def zoneMap(df: DataFrame, longCol: String, doubleCol: String,
              bits: Int, nFiles: Int): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(nFiles >= 1 && nFiles.toLong <= (1L << (2 * bits)),
      s"nFiles=$nFiles exceeds the ${1L << (2 * bits)} Z-values of bits=$bits" +
        " — the file span would floor to 0 and every row would land in one" +
        " NULL file_id")
    val r = df.agg(min(col(longCol)), max(col(longCol)),
      min(col(doubleCol)), max(col(doubleCol))).head()
    val (loL, hiL, loD, hiD) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val z = interleaveBits(binLong(longCol, loL, hiL, bits),
      binDouble(col(doubleCol), loD, hiD, bits), bits)
    // when nFiles does not divide 2^(2*bits) the span floors, so the top
    // Z-values would spill into file_id == nFiles; clamp to nFiles - 1
    // (mirrored by least(...) in the oracle CTEs) so the layout emits
    // exactly the requested file count
    val span = (1L << (2 * bits)) / nFiles
    df.withColumn("_z", z)
      .withColumn("_file", least(expr(s"_z DIV $span"), lit(nFiles - 1L)))
      .groupBy(col("_file").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(longCol)).as(s"min_$longCol"), max(col(longCol)).as(s"max_$longCol"),
        min(col(doubleCol)).as(s"min_$doubleCol"), max(col(doubleCol)).as(s"max_$doubleCol"))
  }
}
