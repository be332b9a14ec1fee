package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-85 decomposition operators (q357–q358); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave85Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q357 matches a sequential bridge recompute; effects " +
    "reconstruct the mean delta within truncation bounds") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("event_type", "ts", "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val t0 = ev.map(_._2).min; val t1 = ev.map(_._2).max
    val mid = t0 + (t1 - t0) / 2
    def stats(late: Boolean) = {
      val rows = ev.filter(e => (e._2 >= mid) == late)
      val nt = rows.length.toLong
      rows.groupBy(_._1).map { case (s, g) =>
        s -> (g.length.toLong * 1000000L / nt,
          g.map(_._3).sum * 1000000L / g.length)
      }
    }
    val s0 = stats(false); val s1 = stats(true)
    val segs = (s0.keySet ++ s1.keySet).toSeq
    val expected = segs.map { s =>
      val (sh0, r0) = s0.getOrElse(s, (0L, 0L))
      val (sh1, r1) = s1.getOrElse(s, (0L, 0L))
      (s, sh0, sh1, r0, r1, (sh1 - sh0) * r0 / 1000000L,
        sh1 * (r1 - r0) / 1000000L)
    }.toSet
    val got = graft.SparkEntry.queries("q357_mean_bridge")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // Bridge identity: Σ(mix + rate effects) ≈ Δmean; each segment
    // contributes ≤ 2 micro truncation plus share-ppm rounding, so
    // bound the residual loosely by segments · (rates + 2).
    val early = ev.filter(_._2 < mid); val late = ev.filter(_._2 >= mid)
    val mean0 = early.map(_._3).sum * 1000000L / early.length
    val mean1 = late.map(_._3).sum * 1000000L / late.length
    val bridge = got.toSeq.map(t => t._6 + t._7).sum
    val tol = got.size.toLong *
      (got.toSeq.map(t => math.max(t._4, t._5)).max / 1000L + 2L)
    assert(math.abs(bridge - (mean1 - mean0)) <= tol)
  }

  test("q358 matches a sequential HHI recompute; HHI bounded by " +
    "(1e6/n, 1e6]") {
    val spend = graft.Tables.table(spark, sf, "orders")
      .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (c, g) => (c, g.map(_._2).sum) }
    val nat = graft.Tables.table(spark, sf, "customer")
      .selectExpr("CAST(c_custkey AS BIGINT)",
        "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = spend.toSeq.groupBy(t => nat(t._1)).map {
      case (n, g) =>
        val tot = g.map(_._2).sum
        val shares = g.map(_._2 * 1000000L / tot)
        (n, g.size.toLong, shares.map(s => s * s).sum / 1000000L,
          shares.max)
    }.toSet
    val got = graft.SparkEntry
      .queries("q358_hhi_concentration")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.forall(t => t._3 <= 1000000L && t._3 >= 900000L / t._2))
  }
}
