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
  * u_k; estimate = (k-1)/(u_k/2^bits)), or Long.MaxValue when fewer
  * than k distinct hashes exist (callers fall back to exact count —
  * with < k distinct values the state IS the exact distinct set).
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
    if (b.length < k) Long.MaxValue else b(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
