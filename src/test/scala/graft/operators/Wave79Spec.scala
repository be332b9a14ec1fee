package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-79 robust-statistics operators (q345–q346);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave79Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q345 matches a sequential robust-means recompute; winsorized " +
    "mean sits between trimmed and raw tails' influence") {
    val cs = graft.Tables.table(spark, sf, "orders")
      .selectExpr("CAST(floor(o_totalprice * 100) AS BIGINT)").collect()
      .map(_.getLong(0)).sorted
    val n = cs.length.toLong
    def fence(k: Long): Long = {
      // min v with cum*20 >= n*k over the value-frequency frame
      var cum = 0L
      var i = 0
      while (i < cs.length) {
        var j = i
        while (j < cs.length && cs(j) == cs(i)) j += 1
        cum += (j - i)
        if (cum * 20 >= n * k) return cs(i)
        i = j
      }
      cs.last
    }
    val p5 = fence(1); val p95 = fence(19)
    val mean = cs.sum * 1000000L / n
    val winsor = cs.map(c => math.max(p5, math.min(p95, c))).sum *
      1000000L / n
    val kept = cs.filter(c => c >= p5 && c <= p95)
    val trim = kept.sum * 1000000L / kept.length
    val nTrimmed = (cs.length - kept.length).toLong
    val got = graft.SparkEntry.queries("q345_robust_means")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4), got.getLong(5), got.getLong(6)) ==
      (n, p5, p95, mean, winsor, trim, nTrimmed))
  }

  test("q346 matches a sequential LOO-influence recompute") {
    val daily = graft.Tables.table(spark, sf, "orders")
      .selectExpr("date_format(o_orderdate, 'yyyy-MM-dd')",
        "CAST(floor(o_totalprice * 100) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val xs = daily.zipWithIndex.map { case ((d, y), i) =>
      (d, i + 1L, y)
    }
    val n = BigInt(xs.size)
    val sx = xs.map(t => BigInt(t._2)).sum
    val sy = xs.map(t => BigInt(t._3)).sum
    val sxx = xs.map(t => BigInt(t._2) * t._2).sum
    val sxy = xs.map(t => BigInt(t._2) * t._3).sum
    val slopeAll = ((n * sxy - sx * sy) * 1000000 /
      (n * sxx - sx * sx)).toLong
    val scored = xs.map { case (d, x, y) =>
      val loo = (((n - 1) * (sxy - BigInt(x) * y) -
        (sx - x) * (sy - y)) * 1000000 /
        ((n - 1) * (sxx - BigInt(x) * x) - (sx - x) * (sx - x))).toLong
      (d, y, slopeAll, loo, slopeAll - loo)
    }
    val expected = scored.sortBy(t => (-math.abs(t._5), t._1)).take(10)
    val got = graft.SparkEntry.queries("q346_slope_influence")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected && got.size == 10)
  }
}
