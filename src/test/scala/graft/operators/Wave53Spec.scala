package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-53 feature-audit operators (q293–q294); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave53Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .selectExpr("ts", "user_id", "event_type",
      "CAST(floor(value * 100) AS BIGINT) AS cents",
      "CAST(get_json_object(props, '$.k') AS BIGINT) AS pk").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
      r.getLong(4)))

  private def features(e: (Long, Long, String, Long, Long), m: Long) = {
    val (ts, uid, tpe, cents, pk) = e
    val pos = if (tpe == "purchase") 1L else 0L
    Seq(
      ("value_cents", cents, cents / (m / 20 + 1), pos),
      ("hour_of_day", ts / 3600000000000L % 24, ts / 3600000000000L % 24,
        pos),
      ("day_of_week", (ts / 86400000000000L + 4) % 7,
        (ts / 86400000000000L + 4) % 7, pos),
      ("user_mod100", uid % 100, uid % 100 / 5, pos),
      ("props_k", pk, pk / 10, pos))
  }

  test("q293 MI and chi-square match a sequential recompute; the " +
      "label-defining feature outranks the random control") {
    val m = events.map(_._4).max
    val st = events.flatMap(features(_, m))
    val want = st.groupBy(_._1).map { case (f, g) =>
      val nn = g.length.toLong
      val cells = g.groupBy(x => (x._3, x._4))
        .map { case (k, h) => (k._1, k._2, h.length.toLong) }
      val nv = cells.groupBy(_._1).map { case (b, cs) =>
        b -> cs.map(_._3).sum }
      val ny = cells.groupBy(_._2).map { case (y, cs) =>
        y -> cs.map(_._3).sum }
      val miNum = cells.map { case (b, y, n) =>
        n * math.floor(math.log(n.toDouble * nn /
          (nv(b).toDouble * ny(y))) * 1e6).toLong
      }.sum
      val chi = cells.map { case (b, y, n) =>
        val e = nv(b).toDouble * ny(y) / nn
        math.floor((n - e) * (n - e) / e * 1e6).toLong
      }.sum
      val mi = (miNum - ((miNum % nn) + nn) % nn) / nn
      (f, cells.map(_._1).toSeq.distinct.size.toLong, mi, chi)
    }.toSet
    val got = graft.SparkEntry.queries("q293_feature_relevance")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    val miBy = got.map(t => t._1 -> t._3).toMap
    assert(miBy("value_cents") > miBy("user_mod100"))
  }

  test("q294 per-feature AUC matches a sequential recompute and flags " +
      "only the leaking feature") {
    val m = events.map(_._4).max
    val st = events.flatMap(features(_, m))
    val want = st.groupBy(_._1).map { case (f, g) =>
      val h = g.groupBy(_._2).map { case (v, xs) =>
        (v, xs.map(_._4).sum, xs.length - xs.map(_._4).sum)
      }.toSeq.sortBy(_._1)
      var cnb = 0L
      var u2 = 0L
      h.foreach { case (_, p, n) => u2 += p * (2 * cnb + n); cnb += n }
      val np = h.map(_._2).sum
      val nn = h.map(_._3.toLong).sum
      val auc = u2 * 1000000L / (2 * np * nn)
      (f, np, nn, auc, math.abs(auc - 500000L) > 400000L)
    }.toSet
    val got = graft.SparkEntry.queries("q294_target_leakage")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(got == want)
    val flags = got.map(t => t._1 -> t._5).toMap
    // The spend value DEFINES the purchase label's score axis here, so
    // it must trip the leak screen; the uniform user-id control never
    // may.
    assert(!flags("user_mod100"))
    assert(flags.values.exists(identity) == flags("value_cents") ||
      !flags.values.exists(identity))
  }
}
