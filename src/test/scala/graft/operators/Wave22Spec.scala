package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-22 eval-metric operators (q228–q231) against
  * independent sequential references (q228 against the O(n²) pairwise
  * AUC definition itself); the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave22Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  /** (cents, isPositive) pairs — the scored corpus, recomputed
    * independently of the operators' shared projection. */
  private lazy val scored: Array[(Long, Boolean)] =
    graft.Tables.table(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (math.floor(r.getDouble(1) * 100).toLong,
        r.getString(0) == "purchase"))

  test("q228 AUC equals the pairwise Mann–Whitney definition") {
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    // 2U from the definition: 2 per win, 1 per tie, over all pairs.
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    val Seq(row) = q("q228_roc_auc").collect().toSeq
    assert(row.getLong(0) == pos.length.toLong)
    assert(row.getLong(1) == neg.length.toLong)
    assert(row.getLong(2) == u2)
    assert(row.getLong(3) ==
      u2 * 1000000L / (2L * pos.length * neg.length))
  }

  test("q229 KS is the max CDF gap, at the smallest attaining score") {
    val nPos = scored.count(_._2).toLong
    val nNeg = scored.length - nPos
    val gaps = scored.map(_._1).distinct.sorted.map { c =>
      val cp = scored.count(x => x._2 && x._1 <= c).toLong
      val cn = scored.count(x => !x._2 && x._1 <= c).toLong
      (c, math.abs(cp * 1000000L / nPos - cn * 1000000L / nNeg))
    }
    val ks = gaps.map(_._2).max
    val at = gaps.filter(_._2 == ks).map(_._1).min
    val Seq(row) = q("q229_ks_statistic").collect().toSeq
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) == ((ks, at, nPos, nNeg)))
  }

  test("q230 calibration bins partition the corpus exactly") {
    val m = scored.map(_._1).max
    val w = m / 10 + 1
    val want = scored.groupBy(_._1 / w).map { case (bin, g) =>
      val nPos = g.count(_._2).toLong
      (bin, g.length.toLong, nPos, nPos * 1000000L / g.length,
        g.map(_._1).sum / g.length)
    }.toSet
    val got = q("q230_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.toSeq.map(_._2).sum == scored.length.toLong)
  }

  test("q231 PR sweep matches a sequential threshold scan") {
    val m = scored.map(_._1).max
    val w = m / 100 + 1
    val nPos = scored.count(_._2).toLong
    val want = (0L until 100L).flatMap { b =>
      val sel = scored.filter(_._1 / w >= b)
      if (sel.isEmpty) None
      else {
        val tp = sel.count(_._2).toLong
        val pp = sel.length.toLong
        Some((b, b * w, tp, pp, tp * 1000000L / pp,
          tp * 1000000L / nPos))
      }
    }.toSet
    val got = q("q231_pr_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    // Recall is monotone non-increasing as the threshold rises.
    val byThr = got.toSeq.sortBy(_._1).map(_._6)
    assert(byThr.zip(byThr.drop(1)).forall { case (a, b) => a >= b })
  }
}
