package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-64 series diagnostics (q315–q316); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave64Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q315 matches a sequential CUSUM recompute") {
    val daily = graft.Tables.table(spark, sf, "orders")
      .selectExpr("date_format(o_orderdate, 'yyyy-MM-dd')",
        "CAST(floor(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val n = daily.size.toLong
    val sN = daily.map(_._2).sum
    val prefix = daily.scanLeft(0L)(_ + _._2).drop(1)
    val cands = daily.zipWithIndex.map { case ((day, _), i) =>
      val k = i + 1L
      val d = (BigInt(n) * prefix(i) - BigInt(k) * sN).abs
      (day, k, d, prefix(i))
    }.filter(_._2 < n)
    val best = cands.minBy(t => (-t._3, t._1))
    val expected = (best._1, best._2, best._3.toLong,
      best._4 / best._2, (sN - best._4) / (n - best._2))
    val got = graft.SparkEntry.queries("q315_cusum_changepoint")(spark, sf)
      .collect()(0)
    assert((got.getString(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) == expected)
  }

  test("q316 matches a sequential log-log OLS recompute; Zipf slope " +
    "is negative") {
    val freq = graft.Tables.table(spark, sf, "documents")
      .selectExpr("text").collect().map(_.getString(0))
      .flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
      .toSeq
    val top = freq.sortBy(t => (-t._2, t._1)).take(200).zipWithIndex
      .map { case ((_, cnt), i) =>
        (math.floor(math.log(1.0 * (i + 1)) * 1000000).toLong,
          math.floor(math.log(1.0 * cnt) * 1000000).toLong, cnt)
      }
    val nT = BigInt(top.size)
    val sx = top.map(t => BigInt(t._1)).sum
    val sy = top.map(t => BigInt(t._2)).sum
    val sxx = top.map(t => BigInt(t._1) * t._1).sum
    val sxy = top.map(t => BigInt(t._1) * t._2).sum
    val syy = top.map(t => BigInt(t._2) * t._2).sum
    val slope = (nT * sxy - sx * sy) * 1000000 / (nT * sxx - sx * sx)
    val r2 = (nT * sxy - sx * sy) * (nT * sxy - sx * sy) * 1000000 /
      ((nT * sxx - sx * sx) * (nT * syy - sy * sy))
    val got = graft.SparkEntry.queries("q316_zipf_exponent")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) ==
      (nT.toLong, slope.toLong, r2.toLong, top.map(_._3).max))
    assert(got.getLong(1) < 0L)
  }
}
