package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-heap top-k aggregator — the distributed analogue of the
  * reference's `TopKHeap` (/root/reference/src/aggo/topk-heap.ts:23-110).
  *
  * Where `collect_list` + `slice` buffers every group member, this
  * `Aggregator` keeps at most k elements per partial buffer: partials are
  * built map-side and merged pairwise, so per-group memory is O(k) no
  * matter how large the group — the property that matters when a single
  * group holds billions of rows at 100 TB. Registered per-call via
  * `functions.udaf`.
  *
  * `smallest = true` keeps the k smallest values (ascending output);
  * `false` keeps the k largest (descending output). Nulls are ignored,
  * like Mongo's `$minN`/`$maxN`.
  */
final class TopKDoubleAggregator(k: Int, smallest: Boolean)
    extends Aggregator[java.lang.Double, Array[Double], Seq[Double]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Double] = Array.empty

  private def trim(sorted: Array[Double]): Array[Double] =
    if (sorted.length <= k) sorted else sorted.take(k)

  private def order(a: Array[Double]): Array[Double] = {
    val s = a.sorted
    if (smallest) s else s.reverse
  }

  override def reduce(buf: Array[Double], v: java.lang.Double): Array[Double] =
    if (v == null) buf
    else if (buf.length < k) order(buf :+ v.doubleValue())
    else {
      val worst = buf.last // buf kept ordered best→worst
      val better = if (smallest) v < worst else v > worst
      if (!better) buf
      else order(buf.updated(buf.length - 1, v.doubleValue()))
    }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    trim(order(a ++ b))

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] = Encoders.kryo[Array[Double]]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object TopKAggregator {
  /** Column function: k smallest (ascending) values of `c` per group. */
  def minK(c: Column, k: Int): Column =
    udaf(new TopKDoubleAggregator(k, smallest = true), Encoders.DOUBLE).apply(c)

  /** Column function: k largest (descending) values of `c` per group. */
  def maxK(c: Column, k: Int): Column =
    udaf(new TopKDoubleAggregator(k, smallest = false), Encoders.DOUBLE).apply(c)
}
