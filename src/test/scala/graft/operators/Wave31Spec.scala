package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-31 operators (q245–q246) against independent
  * sequential references; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave31Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h13(v: Long): Long =
    java.lang.Long.parseLong(md5hex(v.toString).take(13), 16)

  private lazy val events: Array[(Long, Long, Long, Long, String)] =
    graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "event_id", "ts div 1000000000",
        "CAST(floor(value * 100) AS BIGINT)", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

  test("q245 TWA matches a sequential hold-until-next scan") {
    val horizon = 1706745600L
    val want = events.groupBy(_._1).map { case (u, g) =>
      val ordered = g.sortBy(e => (e._3, e._2))
      val dts = ordered.zipWithIndex.map { case (e, i) =>
        val next = if (i + 1 < ordered.length) ordered(i + 1)._3
          else horizon
        (e._4, next - e._3)
      }
      (u, ordered.length.toLong, dts.map(_._2).sum,
        dts.map(d => d._1 * d._2).sum / dts.map(_._2).sum)
    }.toSet
    val got = graft.SparkEntry.queries("q245_time_weighted_avg")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // a user's held time spans from first event to the horizon
    for ((u, g) <- events.groupBy(_._1)) {
      val row = got.find(_._1 == u).get
      assert(row._3 == horizon - g.map(_._3).min)
    }
  }

  test("q246 A/B audit matches a sequential cohort rollup") {
    val perUser = events.groupBy(_._1).map { case (u, g) =>
      (u, h13(u) % 2, if (g.exists(_._5 == "purchase")) 1L else 0L)
    }.toSeq
    val tUsers = perUser.length.toLong
    val tConv = perUser.map(_._3).sum
    val pooled = tConv * 1000000L / tUsers
    val want = perUser.groupBy(_._2).map { case (c, g) =>
      val n = g.length.toLong
      val conv = g.map(_._3).sum
      val rate = conv * 1000000L / n
      (c, n, conv, rate, pooled,
        (rate - pooled) * (rate - pooled) / math.max(pooled, 1L))
    }.toSet
    val got = graft.SparkEntry.queries("q246_ab_experiment")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.size == 2 && got.toSeq.map(_._2).sum == tUsers)
  }
}
