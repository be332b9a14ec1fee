package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-65 temporal monitors (q317–q318); the DuckDB
  * oracle separately hash-checks exact values at the gate SFs.
  */
class Wave65Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q317 matches a sequential trailing-window recompute; every " +
    "burst exceeds 2x baseline") {
    val hours = graft.Tables.table(spark, sf, "events")
      .selectExpr("ts div 3600000000000").collect().map(_.getLong(0))
      .groupBy(identity).map { case (h, g) => (h, g.length.toLong) }
      .toSeq.sortBy(_._1)
    val expected = hours.indices.flatMap { i =>
      if (i < 24) None
      else {
        val trail = hours.slice(i - 24, i).map(_._2).sum
        val (h, c) = hours(i)
        if (c * 24 > trail * 2)
          Some((h, c, trail, c * 24 * 1000000L / trail))
        else None
      }
    }.toSet
    val got = graft.SparkEntry.queries("q317_burst_detection")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.forall(_._4 > 2000000L))
  }

  test("q318 matches a sequential decomposition recompute") {
    val daily = graft.Tables.table(spark, sf, "orders")
      .selectExpr("date_format(o_orderdate, 'yyyy-MM-dd')",
        "CAST(floor(o_totalprice * 100) AS BIGINT)",
        "CAST(dayofweek(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._3))
      .map { case ((d, dow), g) => (d, g.map(_._2).sum, dow) }
      .toSeq.sortBy(_._1)
    val det = daily.indices.flatMap { i =>
      if (i < 3 || i >= daily.size - 3) None
      else {
        val ma7 = daily.slice(i - 3, i + 4).map(_._2).sum / 7
        val (d, c, dow) = daily(i)
        Some((d, c, ma7, c - ma7, dow))
      }
    }
    val eff = det.groupBy(_._5)
      .map { case (dow, g) => dow -> g.map(_._4).sum / g.size }
    val resid = det.map(t => (t._1, t._2, t._3, t._5, eff(t._5),
      t._4 - eff(t._5)))
    val mad = resid.map(t => math.abs(t._6)).sum / resid.size
    val expected = resid.filter(t => math.abs(t._6) > mad * 3).toSet
    val got = graft.SparkEntry
      .queries("q318_seasonal_anomaly_days")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }
}
