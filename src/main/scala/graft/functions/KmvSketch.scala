package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002): the
  * aggregation state is the k smallest DISTINCT hash values seen so
  * far, kept as a sorted array. `reduce` is an O(log k) search +
  * bounded insert; `merge` is a k-bounded sorted merge — so the bytes
  * shuffled per map partition are AT MOST k longs, independent of the
  * partition's cardinality. Compare q60's composable-SQL formulation
  * (distinct → per-partition top-k): same estimate, but that plan
  * shuffles the distinct key set; this aggregator never does.
  *
  * `finish` returns the k-th smallest hash (the KMV order statistic
  * u_k; estimate = (k-1)/(u_k/2^bits)). When fewer than k distinct
  * hashes exist it returns the LARGEST retained hash u_m instead, so
  * the same estimator degrades gracefully — with m < k distinct values
  * the state is the exact distinct set and (k-1)/(u_m/2^bits) is the
  * natural small-cardinality estimate (what an oracle computing
  * (k-1)/(max(h)/2^bits) over all hashes yields). Only an empty group
  * returns Long.MaxValue (estimate ~0).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Long] {

  private def insert(b: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, v)
    if (i >= 0) b // already present
    else {
      val ins = -i - 1
      if (ins >= k) b // larger than the current k minima
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] = insert(b, a)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    b2.foldLeft(b1)(insert)

  override def finish(b: Array[Long]): Long =
    if (b.isEmpty) Long.MaxValue else b(math.min(b.length, k) - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
