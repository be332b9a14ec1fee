package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-91 forensics operators (q369–q370); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave91Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q369 matches a sequential LCB recompute; lcb <= rate always") {
    val rows = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "part"),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("p_brand", "CAST(l_returnflag = 'R' AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (b, g) =>
      val n = g.length.toLong
      val ret = g.map(_._2).sum
      val rate = ret * 1000000L / n
      val lcb = math.max(0L, rate - 1960L *
        math.floor(math.sqrt(
          (rate * (1000000L - rate) / n).toDouble)).toLong / 1000L)
      (b, n, ret, rate, lcb)
    }.toSet
    val got = graft.SparkEntry.queries("q369_return_rate_lcb")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.size == 25)
    assert(got.forall(t => t._5 <= t._4))
  }

  test("q370 matches a sequential pair recompute") {
    val o = graft.Tables.table(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(floor(o_totalprice * 100) AS BIGINT) div 100000",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') " +
          "AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pairs = o.groupBy(t => (t._2, t._3)).values.toSeq.flatMap { g =>
      val gs = g.toSeq
      for (a <- gs; b <- gs if a._1 < b._1)
        yield (a._2, math.abs(a._4 - b._4) / 365L)
    }
    val expected = pairs.groupBy(_._2).map { case (gy, g) =>
      (gy, g.size.toLong, g.map(_._1).distinct.size.toLong)
    }.toSet
    val got = graft.SparkEntry
      .queries("q370_duplicate_payment_scan")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }
}
