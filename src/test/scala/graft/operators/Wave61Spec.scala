package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-61 experiment-design operators (q309–q310);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave61Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q309 CUPED matches a BigInt sequential recompute") {
    val rows = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts",
        "CAST(floor(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = rows.map(_._2).min
    val t1 = rows.map(_._2).max
    val mid = t0 + (t1 - t0) / 2
    val users = rows.groupBy(_._1).map { case (u, g) =>
      (u, g.filter(_._2 < mid).map(_._3).sum,
        g.filter(_._2 >= mid).map(_._3).sum, u % 2)
    }.toSeq
    val n = BigInt(users.size)
    def S(f: ((Long, Long, Long, Long)) => BigInt): BigInt =
      users.map(f).sum
    val sx = S(u => BigInt(u._2)); val sy = S(u => BigInt(u._3))
    val sxx = S(u => BigInt(u._2) * u._2)
    val sxy = S(u => BigInt(u._2) * u._3)
    val syy = S(u => BigInt(u._3) * u._3)
    val nt = S(u => BigInt(if (u._4 == 1) 1 else 0))
    val nc = n - nt
    val sxt = S(u => if (u._4 == 1) BigInt(u._2) else BigInt(0))
    val syt = S(u => if (u._4 == 1) BigInt(u._3) else BigInt(0))
    val sxc = sx - sxt; val syc = sy - syt
    // BigInt `/` truncates toward zero — the div/`//` semantic.
    val theta = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
    val raw = (syt * nc - syc * nt) * 1000000 / (nt * nc)
    val xd = (sxt * nc - sxc * nt) * 1000000 / (nt * nc)
    val adj = raw - theta * xd / 1000000
    val rho2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000 /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = graft.SparkEntry.queries("q309_cuped_adjustment")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4), got.getLong(5)) ==
      ((n.toLong, theta.toLong, raw.toLong, xd.toLong, adj.toLong,
        rho2.toLong)))
    // The whole point: the covariate must explain variance (rho2 > 0)
    // and the adjusted diff must differ from raw only through theta.
    assert(rho2 >= 0 && rho2 <= 1000000)
  }

  test("q310 MDE matches a sequential recompute and shrinks with n") {
    val rows = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id % 2 AS t",
        "CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END " +
          "AS BIGINT) AS pos").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nTot = rows.length.toLong
    val nPos = rows.map(_._2).sum
    val nT = rows.count(_._1 == 1).toLong
    val p = nPos * 1000000L / nTot
    val mde = math.floor(2801585.0 *
      math.sqrt((2.0 * p * (1000000L - p)) / math.min(nT, nTot - nT))
      / 1000000.0).toLong
    val got = graft.SparkEntry.queries("q310_power_mde")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4), got.getLong(5)) ==
      ((nTot, nT, nTot - nT, p, mde, mde * 1000000L / p)))
    // More data → smaller detectable effect (sanity on the formula).
    val mdeHalf = math.floor(2801585.0 *
      math.sqrt((2.0 * p * (1000000L - p)) /
        (math.min(nT, nTot - nT) / 2)) / 1000000.0).toLong
    assert(mde < mdeHalf)
  }
}
