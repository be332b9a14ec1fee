package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded deterministic uniform sample: keeps the payload values of the
  * k rows with the SMALLEST hash keys seen so far (state: parallel sorted
  * arrays, at most k entries). Because membership depends only on the
  * global k-th smallest hash — not on encounter order or partitioning —
  * the sample is a pure function of the input set: any two runs, any
  * partition layout, and any merge tree produce byte-identical samples.
  *
  * That determinism is what makes DOWNSTREAM ESTIMATORS oracle-checkable:
  * quantiles over the sample (q184) hash-match a DuckDB oracle computing
  * the same bottom-k-by-hash sample in SQL, the same way q60's KMV
  * estimate matches exactly rather than "approximately". Statistically
  * the sample is uniform (hashes are uniform on the key), so quantile
  * error follows standard sampling bounds ~O(1/sqrt(k)).
  *
  * Map-side state and shuffle bytes are AT MOST k (hash, value) pairs per
  * partition regardless of group size — the same bounded-merge contract
  * as KmvSketch/KmvMinK (`KmvSketch.scala`).
  */
class BottomKSample(k: Int)
  extends Aggregator[(Long, Double), (Array[Long], Array[Double]), Array[Double]] {

  override def zero: (Array[Long], Array[Double]) =
    (Array.emptyLongArray, Array.emptyDoubleArray)

  override def reduce(
      b: (Array[Long], Array[Double]),
      a: (Long, Double)): (Array[Long], Array[Double]) =
    BottomKSample.insert(b, a._1, a._2, k)

  override def merge(
      b1: (Array[Long], Array[Double]),
      b2: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
    var acc = b1
    var i = 0
    while (i < b2._1.length) {
      acc = BottomKSample.insert(acc, b2._1(i), b2._2(i), k)
      i += 1
    }
    acc
  }

  /** The sampled values, sorted ascending — ready for quantile reads. */
  override def finish(b: (Array[Long], Array[Double])): Array[Double] = {
    val out = b._2.clone()
    java.util.Arrays.sort(out)
    out
  }

  override def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
    ExpressionEncoder[(Array[Long], Array[Double])]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object BottomKSample {
  /** Sorted bounded insert keyed on the hash; distinct hash keys assumed
    * (callers hash a unique row id). O(log k) search + bounded copy.
    * `private[graft]` so the streaming twin (StreamingOps
    * streamQuantileSketch) folds its per-key state through the SAME
    * kernel the batch Aggregator runs — stream == batch by
    * construction, not by reimplementation. */
  private[graft] def insert(
      b: (Array[Long], Array[Double]), h: Long, v: Double,
      k: Int): (Array[Long], Array[Double]) = {
    val (hs, vs) = b
    val i = java.util.Arrays.binarySearch(hs, h)
    if (i >= 0) {
      // hash collision (~2^-52 per pair): keep the MIN value so the
      // sample stays a pure function of the input SET — the oracle
      // groups by hash with min(value) to pin the same total semantics
      if (v < vs(i)) { val nv = vs.clone(); nv(i) = v; (hs, nv) } else b
    } else {
      val ins = -i - 1
      if (ins >= k) b
      else {
        val n = math.min(hs.length + 1, k)
        val oh = new Array[Long](n)
        val ov = new Array[Double](n)
        System.arraycopy(hs, 0, oh, 0, ins)
        System.arraycopy(vs, 0, ov, 0, ins)
        oh(ins) = h
        ov(ins) = v
        System.arraycopy(hs, ins, oh, ins + 1, n - ins - 1)
        System.arraycopy(vs, ins, ov, ins + 1, n - ins - 1)
        (oh, ov)
      }
    }
  }
}
