package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-77 causal estimators (q341–q342); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave77Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  /** (uid, preCents, postCents, arm) — the shared user frame. */
  private lazy val users: Seq[(Long, Long, Long, Long)] = {
    val rows = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts", "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = rows.map(_._2).min; val t1 = rows.map(_._2).max
    val mid = t0 + (t1 - t0) / 2
    rows.groupBy(_._1).map { case (u, g) =>
      (u, g.filter(_._2 < mid).map(_._3).sum,
        g.filter(_._2 >= mid).map(_._3).sum, u % 2)
    }.toSeq
  }

  test("q341 matches a sequential DiD recompute") {
    val t = users.filter(_._4 == 1); val c = users.filter(_._4 == 0)
    val nT = t.size.toLong; val nC = c.size.toLong
    def m(s: Long, n: Long) = s * 1000000L / n
    val preT = m(t.map(_._2).sum, nT); val postT = m(t.map(_._3).sum, nT)
    val preC = m(c.map(_._2).sum, nC); val postC = m(c.map(_._3).sum, nC)
    val got = graft.SparkEntry.queries("q341_did_estimate")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4), got.getLong(5), got.getLong(6)) ==
      (nT, nC, preT, postT, preC, postC,
        (postT - preT) - (postC - preC)))
  }

  test("q342 matches a sequential matching recompute; every match is " +
    "the true nearest control") {
    val treated = users.filter(_._4 == 1)
    val controls = users.filter(_._4 == 0)
    // Replicate the pinned scan rule: backward = max (x, uid) control
    // with x_c <= x_t; forward = min (x, uid) control with x_c > x_t.
    val sortedC = controls.sortBy(t => (t._2, t._1))
    val matched = treated.flatMap { case (_, xt, yt, _) =>
      val b = sortedC.filter(_._2 <= xt).lastOption
      val f = sortedC.find(_._2 > xt)
      val chosen = (b, f) match {
        case (Some(bb), None) => Some((bb, xt - bb._2))
        case (None, Some(ff)) => Some((ff, ff._2 - xt))
        case (Some(bb), Some(ff)) =>
          if (xt - bb._2 <= ff._2 - xt) Some((bb, xt - bb._2))
          else Some((ff, ff._2 - xt))
        case _ => None
      }
      chosen.map { case (ctl, gap) => (yt - ctl._3, gap) }
    }
    val n = matched.size.toLong
    val expected = (n, controls.size.toLong,
      matched.map(_._1).sum * 1000000L / n,
      matched.map(_._2).sum * 1000000L / n)
    val got = graft.SparkEntry.queries("q342_matching_att")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) == expected)
    // Every treated user found a match (controls are non-empty).
    assert(n == treated.size.toLong)
  }
}
