package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-94 demand diagnostics (q375–q376); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave94Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q375 matches a sequential seasonal-index recompute; shares " +
    "sum to ~1e6 per brand") {
    val rows = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "part"),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("p_brand",
        "CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT)",
        "CAST(floor(l_quantity) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(t => (t._1, t._2)).map {
      case ((b, m), g) => (b, m, g.map(_._3).sum)
    }.groupBy(_._1).flatMap { case (b, cells) =>
      val tot = cells.map(_._3).sum
      cells.map { case (_, m, q) =>
        (b, m, q, q * 1000000L / tot, q * 12000000L / tot)
      }
    }.toSet
    val got = graft.SparkEntry
      .queries("q375_brand_seasonal_index")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, g) =>
      val s = g.toSeq.map(_._4).sum
      assert(s > 999900L && s <= 1000000L)
    }
  }

  test("q376 matches a sequential dispersion recompute") {
    val ks = graft.Tables.table(spark, sf, "orders")
      .selectExpr("o_custkey").collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val n = BigInt(ks.size)
    val sk = ks.map(BigInt(_)).sum
    val skk = ks.map(k => BigInt(k) * k).sum
    val disp = ((n * skk - sk * sk) * 1000000 /
      (n * (n - 1) * sk / n)).toLong
    val verdict =
      if (disp > 1100000) "overdispersed"
      else if (disp < 900000) "underdispersed"
      else "poisson_like"
    val got = graft.SparkEntry.queries("q376_dispersion_test")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getString(4)) ==
      (n.toLong, sk.toLong, (sk * 1000000 / n).toLong, disp, verdict))
  }
}
