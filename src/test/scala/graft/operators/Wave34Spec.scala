package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-34 operators (q250–q252) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks exact
  * values at the gate SFs.
  */
class Wave34Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .select("user_id", "ts", "event_id", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getDouble(4)))

  test("q250 CUSUM change point matches a sequential recompute") {
    val daily = events
      .map { case (_, ts, _, tpe, v) =>
        ((tpe, ts / 86400000000000L), math.floor(v * 100 + 0.5).toLong)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = daily.keys.map(_._1).toSeq.distinct.map { tpe =>
      val days = daily.collect { case ((t, d), y) if t == tpe => (d, y) }
        .toSeq.sortBy(_._1)
      val n = days.length.toLong
      val sTot = days.map(_._2).sum
      val cums = days.scanLeft((0L, 0L)) { case ((_, acc), (d, y)) =>
        (d, acc + y * n - sTot)
      }.tail
      // telescoping invariant: the CUSUM returns to zero at the last day
      assert(cums.last._2 == 0L)
      val (day, c) = cums.minBy { case (d, c) => (-math.abs(c), d) }
      (tpe, day, n, c)
    }.toSet
    val got = graft.SparkEntry.queries("q250_cusum_changepoint")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("q251 join-size audit: exact actuals, FK rows at ratio 1e6") {
    val rows = graft.SparkEntry.queries("q251_join_size_audit")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rows.keySet == Set("orders_customer", "events_self_user",
      "customer_supplier_nation"))
    // events self-join actual from the collected rows, never joined
    val hist = events.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val (nl, nr, ndv, est, act, ppm) = rows("events_self_user")
    assert(nl == events.length.toLong && nr == nl)
    assert(ndv == hist.size.toLong)
    assert(act == hist.values.map(c => c * c).sum)
    assert(est == nl * nr / ndv)
    assert(ppm == est * 1000000L / act)
    // skew can only pull the uniformity estimate BELOW the true size
    assert(act >= est)
    // FK join: every order has exactly one customer → estimate exact
    val fk = rows("orders_customer")
    assert(fk._4 == fk._5 && fk._6 == 1000000L)
  }

  test("q252 sequential rules match a per-user sequential recompute") {
    val byUser = events.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._2, e._3)).map(_._4).toSeq)
    val tri = byUser.toSeq.flatMap { case (u, s) =>
      s.sliding(3).filter(_.length == 3).map(w => (u, w(0), w(1), w(2)))
    }
    val pairN = byUser.toSeq.flatMap { case (_, s) =>
      s.sliding(2).filter(_.length == 2).map(w => (w(0), w(1)))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = tri.groupBy(t => (t._2, t._3, t._4)).map {
      case ((a, b, c), g) =>
        val nOcc = g.length.toLong
        (s"$a>$b>$c", g.map(_._1).distinct.length.toLong, nOcc,
          nOcc * 1000000L / pairN((a, b)))
    }.toSet
    val got = graft.SparkEntry.queries("q252_seq_rules")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }
}
