package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-95 grouped trend/diversity operators
  * (q377–q378); the DuckDB oracle separately hash-checks exact values
  * at the gate SFs.
  */
class Wave95Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q377 matches a sequential grouped-OLS recompute") {
    val nm = graft.Tables.table(spark, sf, "orders")
      .join(graft.Tables.table(spark, sf, "customer"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("CAST(c_nationkey AS BIGINT)",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') div 30",
        "CAST(floor(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((n0, x), g) => (n0, x, g.map(_._3).sum) }.toSeq
    val expected = nm.groupBy(_._1).flatMap { case (nat, g) =>
      if (g.size < 2) None
      else {
        val n = BigInt(g.size)
        val sx = g.map(t => BigInt(t._2)).sum
        val sy = g.map(t => BigInt(t._3)).sum
        val sxx = g.map(t => BigInt(t._2) * t._2).sum
        val sxy = g.map(t => BigInt(t._2) * t._3).sum
        Some((nat, g.size.toLong,
          ((n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)).toLong))
      }
    }.toSet
    val got = graft.SparkEntry
      .queries("q377_nation_trend_slopes")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected && got.size == 25)
  }

  test("q378 matches a sequential entropy-breadth recompute; breadth " +
    "bounded by part count") {
    val np = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "orders"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .join(graft.Tables.table(spark, sf, "customer"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("CAST(c_nationkey AS BIGINT)", "l_partkey",
        "CAST(floor(l_quantity) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((n0, p), g) => (n0, p, g.map(_._3).sum) }.toSeq
    val expected = np.groupBy(_._1).map { case (nat, g) =>
      val qt = g.map(_._3).sum
      val h = g.map { case (_, _, q) =>
        -(q * math.floor(
          math.log((1.0 * q) / qt) * 1000000).toLong)
      }.sum / qt
      (nat, g.size.toLong, h,
        math.floor(math.exp(h.toDouble / 1000000)).toLong)
    }.toSet
    val got = graft.SparkEntry
      .queries("q378_assortment_breadth")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.size == 25)
    assert(got.forall(t => t._4 >= 1L && t._4 <= t._2))
  }
}
