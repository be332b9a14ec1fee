package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-44 operators (q273–q274) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave44Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .select("user_id", "ts", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      math.floor(r.getDouble(3) * 100 + 0.5).toLong))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q273 bandit replay matches a sequential recompute") {
    val arms = events.map(_._3).distinct.sorted
    val armIdx = arms.zipWithIndex.toMap
    val n = events.length.toLong
    val matched = events.filter { case (u, _, tpe, _) =>
      val chosen = java.lang.Long.parseLong(
        md5hex(u.toString).take(13), 16) % arms.length
      armIdx(tpe).toLong == chosen
    }
    val want = matched.groupBy(_._3).map { case (arm, g) =>
      val cnt = g.length.toLong
      val sum = g.map(_._4).sum
      (arm, cnt, sum, sum / cnt, cnt * 1000000L / n)
    }.toSet
    val got = graft.SparkEntry.queries("q273_bandit_replay")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
  }

  test("q274 pinball loss matches a sequential recompute") {
    val daily = events
      .map { case (_, ts, tpe, cents) =>
        ((tpe, ts / 86400000000000L), cents)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val taus = Seq(100000L, 500000L, 900000L)
    val want = daily.keys.map(_._1).toSeq.distinct.flatMap { tpe =>
      val series = daily.collect { case ((t, d), y) if t == tpe => (d, y) }
        .toSeq.sortBy(_._1).map(_._2)
      val errs = series.drop(7).zip(series.dropRight(7))
        .map { case (y, yhat) => y - yhat }
      taus.map { tau =>
        (tpe, tau, errs.length.toLong,
          errs.map(e => math.max(tau * e, (tau - 1000000L) * e)).sum)
      }
    }.toSet
    val got = graft.SparkEntry.queries("q274_pinball_loss")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // pinball loss is nonnegative by construction
    assert(got.forall(_._4 >= 0L))
  }
}
