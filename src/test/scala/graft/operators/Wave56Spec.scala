package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-56 behavioral operators (q300–q301); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave56Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .selectExpr("user_id", "ts", "event_type").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("q300 abandonment matches a sequential recompute") {
    val day = 86400000000000L
    val purchasesByUser = events.filter(_._3 == "purchase")
      .groupBy(_._1).map { case (u, g) => u -> g.map(_._2) }
    val views = events.filter(_._3 == "view")
    val flagged = views.map { case (u, ts, _) =>
      val converted = purchasesByUser.getOrElse(u, Array.empty[Long])
        .exists(p => p > ts && p <= ts + 24L * 3600 * 1000000000L)
      (ts / day, converted)
    }
    val want = flagged.groupBy(_._1).map { case (d, g) =>
      val nv = g.length.toLong
      val na = g.count(!_._2).toLong
      (d, nv, na, na * 1000000L / nv)
    }.toSet
    val got = graft.SparkEntry.queries("q300_cart_abandonment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
  }

  test("q301 Nelson-Aalen hazard matches a sequential recompute; " +
      "censoring holds the last day at zero hazard") {
    val day = 86400000000000L
    val lastDay = events.groupBy(_._1)
      .map { case (_, g) => g.map(_._2 / day).max }.toSeq
    val dmax = lastDay.max
    val nUsers = lastDay.size.toLong
    val byDay = lastDay.groupBy(identity)
      .map { case (d, g) => d -> g.size.toLong }
    val days = byDay.keys.toSeq.sorted
    var endedBefore = 0L
    var cum = 0L
    val want = days.map { d =>
      val atRisk = nUsers - endedBefore
      val churned = if (d < dmax) byDay(d) else 0L
      val hz = churned * 1000000L / atRisk
      cum += hz
      endedBefore += byDay(d)
      (d, atRisk, churned, hz, cum)
    }.toSet
    val got = graft.SparkEntry.queries("q301_nelson_aalen_churn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
    // The censored (max) day contributes zero hazard by construction.
    val lastRow = got.maxBy(_._1)
    assert(lastRow._3 == 0L && lastRow._4 == 0L)
  }
}
