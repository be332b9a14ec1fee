package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-58 statistical operators (q304–q305); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave58Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .selectExpr("event_id", "ts", "user_id", "event_type").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q304 SPRT audit matches a sequential replay") {
    val lnHit = math.floor(math.log(0.22 / 0.18) * 1e6).toLong
    val lnMiss = math.floor(math.log(0.78 / 0.82) * 1e6).toLong
    val bound = math.floor(math.log(19.0) * 1e6).toLong
    val ordered = events.sortBy(_._1)
    var llr = 0L
    var firstCross = -1L
    var crossLlr = 0L
    ordered.foreach { case (id, _, _, tpe) =>
      llr += (if (tpe == "purchase") lnHit else lnMiss)
      if (firstCross < 0 && math.abs(llr) >= bound) {
        firstCross = id; crossLlr = llr
      }
    }
    val n = ordered.length.toLong
    val decision =
      if (firstCross < 0) "continue"
      else if (crossLlr > 0) "accept_h1" else "accept_h0"
    val frac = if (firstCross < 0) -1L else (firstCross + 1) * 1000000L / n
    val got = graft.SparkEntry.queries("q304_sprt_audit")(spark, sf)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getLong(4), r.getLong(5)) ==
      ((n, bound, firstCross, decision, frac, llr)))
  }

  test("q305 stratified ATE matches a sequential recompute; strata " +
      "differences aggregate to the reported ATE") {
    val rows = events.map { case (_, ts, uid, tpe) =>
      ((ts / 3600000000000L % 24) / 6, uid % 2,
        if (tpe == "purchase") 1L else 0L)
    }
    val per = rows.groupBy(_._1).map { case (st, g) =>
      val t1 = g.filter(_._2 == 1)
      val t0 = g.filter(_._2 == 0)
      val y1 = t1.map(_._3).sum * 1000000L / t1.length
      val y0 = t0.map(_._3).sum * 1000000L / t0.length
      (st.toString, g.length.toLong, t1.length.toLong, t0.length.toLong,
        y1, y0, y1 - y0)
    }.toSet
    val num = per.toSeq.map(p => p._2 * p._7).sum
    val den = per.toSeq.map(_._2).sum
    val ate = Math.floorDiv(num, den)
    val want = per + (("__ate__", den,
      per.toSeq.map(_._3).sum, per.toSeq.map(_._4).sum, 0L, 0L, ate))
    val got = graft.SparkEntry.queries("q305_stratified_ate")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want)
  }
}
