package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-38 operators (q260–q262) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave38Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .select("user_id", "ts", "event_id", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getDouble(4)))

  test("q260 ranks the keyless order last and the estimates check out") {
    val rows = graft.SparkEntry.queries("q260_join_order_advisor")(
      spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 3)
    val byName = rows.map(r => r._1 -> r).toMap
    // cross-product order is the worst by construction
    assert(byName("lineitem_customer_first")._3 == 3L)
    // FK estimate: lineitem⋈orders ≈ |lineitem| under uniformity
    def t(n: String) = graft.Tables.table(spark, sf, n)
    val nL = t("lineitem").count()
    val nO = t("orders").count()
    val nC = t("customer").count()
    assert(byName("lineitem_customer_first")._2 == nL * nC)
    assert(byName("lineitem_orders_first")._2 ==
      nL * nO / t("orders").select("o_orderkey").distinct().count())
    // ranks are a permutation of 1..3 consistent with the estimates
    assert(rows.sortBy(_._3).map(_._2).sameElements(
      rows.map(_._2).sorted))
  }

  test("q261 clamped balance equals the sequential state machine") {
    val want = events
      .filter(e => e._4 == "purchase" || e._4 == "click")
      .map { case (u, ts, id, tpe, v) =>
        val cents = math.floor(v * 100 + 0.5).toLong
        (u, ts, id, if (tpe == "purchase") cents else -cents)
      }
      .groupBy(_._1).map { case (u, g) =>
        var bal = 0L; var credits = 0L; var debits = 0L; var burned = 0L
        g.sortBy(e => (e._2, e._3)).foreach { case (_, _, _, delta) =>
          if (delta > 0) credits += delta else debits += -delta
          val next = bal + delta
          if (next < 0) { burned += -next; bal = 0L } else bal = next
        }
        (u, bal, credits, debits, burned)
      }.toSet
    val got = graft.SparkEntry.queries("q261_clamped_balance")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
  }

  test("q262 forecast eval matches a sequential lag-7 recompute") {
    val daily = events
      .map { case (_, ts, _, tpe, v) =>
        ((tpe, ts / 86400000000000L), math.floor(v * 100 + 0.5).toLong)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = daily.keys.map(_._1).toSeq.distinct.map { tpe =>
      val series = daily.collect { case ((t, d), y) if t == tpe => (d, y) }
        .toSeq.sortBy(_._1).map(_._2)
      val pairs = series.drop(7).zip(series.dropRight(7))
      val errs = pairs.map { case (y, yhat) => math.abs(y - yhat) }
      val totErr = errs.sum
      val totY = pairs.map(_._1).sum
      (tpe, pairs.length.toLong, totErr, totErr / pairs.length,
        totErr * 1000000L / totY)
    }.toSet
    val got = graft.SparkEntry.queries("q262_seasonal_forecast_eval")(
      spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
  }
}
