package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) as a
  * bounded-state Aggregator: m=128 one-byte registers, so each map
  * partition ships EXACTLY 128 bytes per group regardless of its
  * cardinality — the textbook mergeable-sketch shuffle contract
  * (elementwise-max merge), completing the sketch family next to KMV
  * (order statistics, set algebra) and CMS (frequency).
  *
  * Engine-portable determinism: the input is a 60-bit integer the
  * QUERY derives from md5 (the same portable hash every sketch here
  * uses); bucket = top 7 bits, ρ = leading-zero rank of the remaining
  * 53 bits (54 when they are all zero). The estimate is the RAW HLL
  * harmonic mean in exact integer arithmetic, so Spark and a SQL
  * recompute agree bit-for-bit:
  *
  *   S  = Σ_j 2^(48 − min(ρ_j, 48))         (exact i64; Σ 2^-ρ scaled
  *                                            by 2^48, ρ clamped at 48
  *                                            — beyond-48 ranks are
  *                                            astronomically rare and
  *                                            contribute < 2^-48)
  *   A  = floor(2^62 / S)                    (= m²/Σ2^-ρ scaled by 1e0)
  *   E  = floor(715275 · A / 1e6)            (α₁₂₈ = 0.7213/(1+1.079/m)
  *                                            pinned to micro units;
  *                                            the product runs in
  *                                            BigInt/HUGEINT)
  *
  * Raw estimator only: no linear-counting small-range correction and
  * no large-range correction (the 60-bit hash space makes the latter
  * irrelevant; the former would need the zero-register count, which an
  * auditing query can derive separately) — an empty group therefore
  * reports α·m ≈ 91, the estimator's documented no-data bias, not 0.
  */
class HllSketch extends Aggregator[Long, Array[Byte], Long] {
  import HllSketch._

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
    val bucket = (h >>> 53).toInt & (M - 1)
    val rest = h & ((1L << 53) - 1)
    val rho = if (rest == 0L) 54 else java.lang.Long.numberOfLeadingZeros(rest) - 10
    if (rho > b(bucket)) b(bucket) = rho.toByte
    b
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def finish(b: Array[Byte]): Long = estimate(b)

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HllSketch {
  val M = 128
  val AlphaMicro = 715275L // floor(1e6 * 0.7213 / (1 + 1.079/128))

  /** The exact-integer estimate shared by finish() and the specs. */
  def estimate(regs: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < M) {
      s += 1L << (48 - math.min(regs(i).toInt, 48))
      i += 1
    }
    val a = (1L << 62) / s
    (BigInt(AlphaMicro) * a / 1000000L).toLong
  }
}
