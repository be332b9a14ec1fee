package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-98 dependence operators (q383–q384); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave98Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q383 matches a sequential crosstab recompute") {
    val rows = graft.Tables.table(spark, sf, "orders")
      .join(graft.Tables.table(spark, sf, "lineitem"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .selectExpr("o_orderstatus", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nAll = rows.length.toLong
    val expected = rows.groupBy(identity).map { case ((o, l), g) =>
      val v =
        if (o == "F" && l == "O") "violation"
        else if (o == "O" && l == "F") "partial"
        else "consistent"
      (o, l, g.length.toLong, g.length.toLong * 1000000L / nAll, v)
    }.toSet
    val got = graft.SparkEntry
      .queries("q383_status_consistency")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q384 matches a sequential copula recompute; densities average " +
    "to ~1e6") {
    val cust = graft.Tables.table(spark, sf, "orders")
      .selectExpr("o_custkey",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')",
        "CAST(floor(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq.map { case (_, g) =>
        ((g.map(_._2).max - g.map(_._2).min).toLong, g.map(_._3).sum)
      }
    val n = cust.size.toLong
    def cuts(vs: Seq[Long]): Seq[Long] = {
      val sorted = vs.sorted
      (1 to 9).map(j =>
        sorted.find(v => sorted.count(_ <= v) * 10 >= n * j).get)
    }
    val tC = cuts(cust.map(_._1)); val sC = cuts(cust.map(_._2))
    val expected = cust.map { case (t, s0) =>
      (1L + tC.count(t >= _), 1L + sC.count(s0 >= _))
    }.groupBy(identity).map { case ((td, sd), g) =>
      (td, sd, g.size.toLong, g.size.toLong * 100L * 1000000L / n)
    }.toSet
    val got = graft.SparkEntry.queries("q384_copula_grid")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // Mass sums to the population; mean density ≈ 1e6.
    assert(got.toSeq.map(_._3).sum == n)
  }
}
