package graft.exprs.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Bounded-heap top-k aggregate over ANY orderable key type — numbers,
  * strings, timestamps, and (encounter-order / sortBy) structs — so every
  * `$minN/$maxN/$firstN/$lastN/$top(N)/$bottom(N)` accumulator keeps O(k)
  * state per group instead of `collect_list`-buffering the whole group
  * (the property that matters when one hot group holds billions of rows;
  * reference analogue: aggo's TopKHeap, topk-heap.ts:23-110).
  *
  * Keeps the k best (key, value) pairs by the key's natural interpreted
  * ordering — ascending when `smallest`, descending otherwise — and
  * returns the values in that order. Rows with a null key are ignored
  * (Mongo `$minN`/`$maxN` semantics; struct keys are never null at the top
  * level, so encounter-order accumulators keep every row). A
  * `TypedImperativeAggregate`, so it runs map-side partial + merge like
  * any built-in aggregate; partials serialize as length-prefixed
  * UnsafeRows.
  */
case class BoundedTopKAggregate(key: Expression, value: Expression, k: Int,
                                smallest: Boolean,
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {
  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(value.dataType, containsNull = true)
  override def prettyName: String = "graft_top_k"

  // best→worst ordering over the buffered (key, value) rows' key field
  @transient private lazy val ordering: Ordering[InternalRow] = {
    val asc = RowOrdering.createNaturalAscendingOrdering(Seq(key.dataType))
    if (smallest) asc else asc.reverse
  }

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] = ArrayBuffer.empty

  private def pairOf(input: InternalRow): InternalRow = {
    val kv = new Array[Any](2)
    kv(0) = InternalRow.copyValue(key.eval(input))
    kv(1) = InternalRow.copyValue(value.eval(input))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(kv)
  }

  private def insertSorted(buf: ArrayBuffer[InternalRow], row: InternalRow): Unit = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(buf(mid), row) <= 0) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, row)
  }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    if (key.eval(input) != null) {
      val row = pairOf(input)
      if (buf.length < k) insertSorted(buf, row)
      else if (ordering.compare(row, buf.last) < 0) {
        buf.remove(buf.length - 1)
        insertSorted(buf, row)
      }
    }
    buf
  }

  override def merge(a: ArrayBuffer[InternalRow], b: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    b.foreach { row =>
      if (a.length < k) insertSorted(a, row)
      else if (ordering.compare(row, a.last) < 0) {
        a.remove(a.length - 1)
        insertSorted(a, row)
      }
    }
    a
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.map(r =>
      InternalRow.copyValue(r.get(1, value.dataType))).toArray)

  @transient private lazy val proj =
    UnsafeProjection.create(Array(key.dataType, value.dataType))

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { row =>
      val bytes = proj(row).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))
}
