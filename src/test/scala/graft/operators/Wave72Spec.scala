package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-72 sampling-design / series-coupling
  * operators (q331–q332); the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave72Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q331 matches a sequential Neyman recompute and allocates " +
    "exactly 1000") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("event_type", "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val strata = ev.groupBy(_._1).map { case (et, g) =>
      val n = BigInt(g.size)
      val sx = g.map(t => BigInt(t._2)).sum
      val sxx = g.map(t => BigInt(t._2) * t._2).sum
      val varC2 = ((n * sxx - sx * sx) / (n * n)).toLong
      val sd = math.floor(math.sqrt(varC2.toDouble)).toLong
      (et, g.size.toLong, sd, g.size.toLong * sd)
    }.toSeq
    val totW = strata.map(_._4).sum
    val based = strata.map { case (et, n, sd, w) =>
      (et, n, sd, w, 1000L * w / totW, 1000L * w % totW)
    }
    val leftover = 1000L - based.map(_._5).sum
    val winners = based.sortBy(t => (-t._6, t._1)).take(leftover.toInt)
      .map(_._1).toSet
    val expected = based.map { case (et, n, sd, w, base, _) =>
      (et, n, sd, w, base + (if (winners(et)) 1L else 0L))
    }.toSet
    val got = graft.SparkEntry
      .queries("q331_neyman_allocation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.toSeq.map(_._5).sum == 1000L)
  }

  test("q332 matches a sequential lead-lag recompute; lag 0 has the " +
    "full day overlap") {
    val daily = graft.Tables.table(spark, sf, "events")
      .selectExpr("ts div 86400000000000", "event_type",
        "CAST(floor(value * 100) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (day, g) =>
        (day, g.size.toLong,
          g.filter(_._2 == "purchase").map(_._3).sum)
      }.toSeq
    val byDay = daily.map(t => t._1 -> (t._2, t._3)).toMap
    val expected = (-7L to 7L).map { lag =>
      val joined = daily.flatMap { case (day, x, _) =>
        byDay.get(day + lag).map { case (_, y) => (x, y) }
      }
      val n = BigInt(joined.size)
      val sx = joined.map(t => BigInt(t._1)).sum
      val sy = joined.map(t => BigInt(t._2)).sum
      val sxx = joined.map(t => BigInt(t._1) * t._1).sum
      val sxy = joined.map(t => BigInt(t._1) * t._2).sum
      val slope = ((n * sxy - sx * sy) * 1000000 /
        (n * sxx - sx * sx)).toLong
      (lag, joined.size.toLong, slope)
    }.toSet
    val got = graft.SparkEntry
      .queries("q332_leadlag_regression")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected && got.size == 15)
    val lag0 = got.find(_._1 == 0L).get
    assert(got.forall(_._2 <= lag0._2))
  }
}
