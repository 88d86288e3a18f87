package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (backward / most-recent-match): for every left row,
  * attach the latest right-side values whose timestamp is <= the left row's
  * timestamp, per key — the standard temporal join of feature pipelines
  * ("state as of event time"). The reference has no as-of join (SURVEY §2.4);
  * this is a beyond-parity training-pipeline operator.
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (`l.join(r, key && r.ts <= l.ts)` + argmax) explodes to O(|matches|)
  * intermediate rows. The scalable classic is union + one partitioned sort:
  * tag both sides, union, and per key take the running last non-null right
  * value in (ts, side) order. ONE shuffle on the key, no range blowup, no
  * driver-side state — at 100 TB it is a single sort-merge pass whose cost
  * is the same as any keyed window.
  *
  * Contract: `valueCols` must not collide with left column names; rows with
  * equal (key, ts) on both sides match inclusively (right sorts first); the
  * right side should be unique per (key, ts) for deterministic output; a
  * null in a right value column is transparent (the older value carries
  * forward). NB: unlike an equi-join, null keys group together here (window
  * partitioning, not join matching) — pre-filter null-keyed rows if SQL
  * join semantics are required.
  */
object AsofJoin {
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.intersect(left.columns.toSeq).isEmpty,
      s"valueCols ${valueCols.mkString(",")} collide with left columns")
    require(valueCols.intersect(keyCols :+ tsCol).isEmpty,
      s"valueCols ${valueCols.mkString(",")} collide with key/ts columns")
    require(!left.columns.contains("_side") && !valueCols.contains("_side"),
      "'_side' is reserved by the as-of implementation")
    val l = left.withColumn("_side", lit(1))
    val r = right.select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(u) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .filter(col("_side") === 1).drop("_side")
  }
}
