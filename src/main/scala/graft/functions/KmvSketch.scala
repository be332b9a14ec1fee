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

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] =
    KmvSketch.insert(b, a, k)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    b2.foldLeft(b1)(KmvSketch.insert(_, _, k))

  override def finish(b: Array[Long]): Long =
    if (b.isEmpty) Long.MaxValue else b(math.min(b.length, k) - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object KmvSketch {
  /** Sorted bounded insert shared by the two KMV aggregators: O(log k)
    * search + bounded copy, state never exceeds k distinct longs. */
  private[functions] def insert(b: Array[Long], v: Long, k: Int): Array[Long] = {
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
}

/** KMV sketch variant that returns the WHOLE retained min-k array
  * (sorted ascending) instead of just the k-th order statistic.
  *
  * This is the mergeable-sketch contract set algebra needs: two
  * sketches over different partitions of a keyspace can be combined
  * AFTER aggregation — union = min-k of the concatenation, and the
  * intersection/Jaccard estimators (Beyer et al., SIGMOD 2007) only
  * need membership tests of the union sketch's values in each input
  * sketch. Per-group state is still at most k longs, map-side
  * combined, so a per-source sketch over 100 TB ships k×|sources|
  * longs to the reducers — never the distinct keys themselves (q165
  * builds per-source shingle sketches exactly this way).
  */
class KmvMinK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] =
    KmvSketch.insert(b, a, k)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    b2.foldLeft(b1)(KmvSketch.insert(_, _, k))

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
