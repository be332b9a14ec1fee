package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The HLL register sketch's algebraic contract: register derivation,
  * merge = elementwise max (associative, commutative, idempotent), the
  * pinned integer estimator, and the estimator's accuracy band.
  */
class HllSketchSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(v: Long): Long =
    java.lang.Long.parseLong(md5hex(v.toString).take(15), 16)

  private def regsOf(vals: Seq[Long]): Array[Byte] = {
    val agg = new HllSketch
    vals.foldLeft(agg.zero)((b, v) => agg.reduce(b, h60(v)))
  }

  test("registers match an independent bucket/rho recompute") {
    val vals = (0L until 500L)
    val got = regsOf(vals)
    val want = new Array[Byte](HllSketch.M)
    vals.foreach { v =>
      val h = h60(v)
      val bucket = (h >>> 53).toInt
      val rest = h & ((1L << 53) - 1)
      // 54 - bit_length(rest), the oracle's string-free formulation
      val rho =
        if (rest == 0L) 54
        else 54 - java.lang.Long.toBinaryString(rest).length
      if (rho > want(bucket)) want(bucket) = rho.toByte
    }
    assert(got.toSeq == want.toSeq)
  }

  test("merge of split halves == single-pass reduce, in any order") {
    val vals = (0L until 2000L)
    val agg = new HllSketch
    val whole = regsOf(vals)
    val (a, b) = vals.splitAt(700)
    val m1 = agg.merge(regsOf(a), regsOf(b))
    assert(m1.toSeq == whole.toSeq)
    val m2 = agg.merge(regsOf(b.reverse), regsOf(a.reverse))
    assert(m2.toSeq == whole.toSeq)
    // idempotent: merging a sketch with itself changes nothing
    assert(agg.merge(whole.clone(), whole).toSeq == whole.toSeq)
  }

  test("estimate lands in the documented ±1.04/sqrt(128) band") {
    for (n <- Seq(300, 1000, 5000)) {
      val est = HllSketch.estimate(regsOf((0L until n.toLong)))
      // 3 standard errors ≈ 28%
      assert(math.abs(est - n) <= n * 0.28,
        s"n=$n est=$est outside the accuracy band")
    }
  }

  test("empty sketch reports the raw estimator's alpha*m bias, not 0") {
    val est = HllSketch.estimate(new Array[Byte](HllSketch.M))
    assert(est == HllSketch.AlphaMicro * 128 / 1000000)
  }
}
