package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary (Misra & Gries, "Finding repeated
  * elements", Sci. Comp. Prog. 1982) as a mergeable Spark
  * `Aggregator`: the aggregation state is AT MOST k (item, count)
  * pairs whatever the input cardinality, so per-partition summaries
  * shuffle O(k) bytes — the bounded-state alternative to a full
  * groupBy count when the token universe is corpus-sized.
  *
  * Deficit guarantee: after summarizing a stream of n items, every
  * item's stored count undercounts its true frequency by at most
  * n/(k+1), so any item with true frequency > n/(k+1) is GUARANTEED
  * present in the summary. `merge` (Agarwal et al., "Mergeable
  * summaries", PODS 2012) sums the two summaries then subtracts the
  * (k+1)-th largest combined count from every entry, dropping the
  * non-positive ones — the deficits add, so the n/(k+1) guarantee
  * holds across any merge tree, which is exactly what makes the
  * summary safe under Spark's arbitrary partial-aggregation order.
  *
  * The summary yields CANDIDATES with one-sided error (never misses a
  * heavy hitter; may include light ones). q220 composes it with an
  * exact count of just the ≤ k candidates — a broadcast semi-join —
  * so the final answer is exact while the full-universe pass stays
  * bounded-state.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1L)
      case None if b.size < k => b.updated(a, 1L)
      case None =>
        // Counter set full: decrement every counter (the new item's
        // implicit counter hits 0 and is not stored). O(k), but only
        // on misses-at-capacity — the classic amortized bound.
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(
      b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    val sum = b2.foldLeft(b1) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // (k+1)-th largest combined count, subtracted from all — keeps
      // ≤ k entries and adds that amount to every deficit.
      val kth = sum.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(k)
      sum.flatMap { case (t, c) =>
        if (c - kth > 0L) Some(t -> (c - kth)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
