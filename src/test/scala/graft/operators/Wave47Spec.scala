package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-47 Gini operator (q279) against a sequential
  * recompute; the DuckDB oracle separately hash-checks exact values at
  * the gate SFs.
  */
class Wave47Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q279 Gini matches a sequential recompute and stays in [0, 1e6)") {
    val ords = graft.Tables.table(spark, sf, "orders")
      .selectExpr("CAST(o_custkey AS BIGINT)", "o_totalprice").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val custNat = graft.Tables.table(spark, sf, "customer")
      .selectExpr("CAST(c_custkey AS BIGINT)", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natName = graft.Tables.table(spark, sf, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perCust = ords.groupBy(_._1).map { case (ck, g) =>
      (custNat(ck), ck,
        (g.map(_._2).sum * 100).setScale(0, BigDecimal.RoundingMode.FLOOR)
          .toLongExact)
    }
    val want = perCust.groupBy(_._1).map { case (nk, g) =>
      val sorted = g.toSeq.sortBy(c => (c._3, c._2)).map(_._3)
      val n = sorted.length.toLong
      val tot = sorted.sum
      val rs = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val num = 2 * rs - (n + 1) * tot
      (natName(nk), n, tot, (num / n) * 1000000L / tot)
    }.toSet
    val got = graft.SparkEntry.queries("q279_gini_by_nation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.forall(r => r._4 >= 0L && r._4 < 1000000L))
  }
}
