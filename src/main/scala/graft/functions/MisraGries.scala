package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a native Catalyst aggregate — the
  * bounded-state heavy-hitters primitive a 100 TB frequency profile needs:
  * an exact `GROUP BY item` shuffles every distinct item (unbounded state,
  * a full shuffle of the key universe); this sketch keeps at most k-1
  * counters per partial buffer, merges associatively on the map side, and
  * moves O(k) bytes per partition regardless of input size.
  *
  * Algorithm (Misra & Gries 1982; merge step per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): update increments a tracked item,
  * admits an untracked one while capacity remains, otherwise decrements
  * every counter; merge sums two summaries then subtracts the (k)-th
  * largest count and drops non-positives. Guarantees, independent of
  * partitioning and merge order: every estimate is an UNDERCOUNT by at
  * most n/k (n = total rows aggregated), so every item with true frequency
  * > n/k is present in the summary. The `sketch_heavy_hitters` oracle
  * checks exactly those two theorems against exact DuckDB counts (the
  * counter VALUES are merge-order dependent; the guarantees are not).
  *
  * The role the reference fills with full `value_counts()` passes over
  * collected frames (ref: test/validate_cdc_data.py:92-118's whole-table
  * re-selects) — re-expressed as constant-state streaming aggregation.
  */
case class MisraGries(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with BinaryLike[Expression] {

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue
  private def cap: Int = k - 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects a string item column, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("misra_gries k must be an int literal")
    else if (right.eval() == null || right.eval().asInstanceOf[Number].intValue < 2)
      TypeCheckResult.TypeCheckFailure("misra_gries k must be >= 2")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = left.eval(input)
    if (v == null) return buf
    MisraGries.updateOne(buf, v.asInstanceOf[UTF8String].toString, cap)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    MisraGries.mergeInto(buf, other, cap)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toSeq.sortBy { case (s, c) => (-c, s) }
      .map { case (s, c) => InternalRow(UTF8String.fromString(s), c) }.toArray[Any])

  // length-prefixed byte arrays, NOT writeUTF: writeUTF caps entries at
  // 64 KB of UTF-8 and this aggregate is pitched at arbitrary strings
  // (URLs, shingles) where one oversized item would fail the whole job
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MisraGries =
    copy(left = l, right = r)
  override def prettyName: String = "misra_gries"
}

/** The summary algebra itself, shared by the Catalyst aggregate above and
  * the streaming state operator ([[graft.streaming.StatefulOps]]) — one
  * definition of update and merge, so the two surfaces cannot drift.
  */
object MisraGries {
  /** In-place single-item update against a cap of `cap` tracked counters. */
  def updateOne(buf: mutable.HashMap[String, Long], item: String, cap: Int): Unit =
    buf.get(item) match {
      case Some(c) => buf(item) = c + 1
      case None if buf.size < cap => buf(item) = 1L
      case None => // decrement-all: charges 1 error to every tracked item
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (s, c) => if (c == 1L) dead += s else buf(s) = c - 1 }
        dead.foreach(buf.remove)
    }

  /** In-place mergeable-summaries merge: sum, then subtract the
    * (cap+1)-th largest count and drop non-positives.
    */
  def mergeInto(buf: mutable.HashMap[String, Long],
                other: collection.Map[String, Long], cap: Int): Unit = {
    other.foreach { case (s, c) => buf(s) = buf.getOrElse(s, 0L) + c }
    if (buf.size > cap) {
      val m = buf.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(cap)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (s, c) => if (c - m <= 0L) dead += s else buf(s) = c - m }
      dead.foreach(buf.remove)
    }
  }
}
