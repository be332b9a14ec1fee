package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-89 inventory/randomness operators
  * (q365–q366); the DuckDB oracle separately hash-checks exact values
  * at the gate SFs.
  */
class Wave89Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q365 matches a sequential newsvendor recompute; stock covers " +
    ">= 3/4 of weeks") {
    val weekly = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "part"),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("p_brand",
        "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') div 7",
        "CAST(floor(l_quantity) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((b, w), g) => (b, w, g.map(_._3).sum) }.toSeq
    val expected = weekly.groupBy(_._1).map { case (b, g) =>
      val dems = g.map(_._3).sorted
      val n = dems.length.toLong
      var cum = 0L; var q75 = dems.last
      var i = 0
      var found = false
      while (i < dems.length && !found) {
        var j = i
        while (j < dems.length && dems(j) == dems(i)) j += 1
        cum += (j - i)
        if (cum * 4 >= n * 3) { q75 = dems(i); found = true }
        i = j
      }
      (b, n, dems.sum * 1000000L / n, q75)
    }.toSet
    val got = graft.SparkEntry.queries("q365_newsvendor_stock")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.size == 25)
    // coverage: ≥ 3/4 of weeks have demand ≤ stock_q75
    got.foreach { case (b, n, _, q) =>
      val covered = weekly.filter(_._1 == b).count(_._3 <= q).toLong
      assert(covered * 4 >= n * 3)
    }
  }

  test("q366 matches a sequential runs-test recompute") {
    val daily = graft.Tables.table(spark, sf, "orders")
      .selectExpr("date_format(o_orderdate, 'yyyy-MM-dd')",
        "CAST(floor(o_totalprice * 100) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val cents = daily.map(_._2).sorted
    val n = cents.length.toLong
    var cum = 0L; var median = cents.last; var i = 0; var found = false
    while (i < cents.length && !found) {
      var j = i
      while (j < cents.length && cents(j) == cents(i)) j += 1
      cum += (j - i)
      if (cum * 2 >= n) { median = cents(i); found = true }
      i = j
    }
    val signs = daily.map(_._2 > median)
    val runs = 1L + signs.sliding(2).count(w =>
      w.size == 2 && w(0) != w(1))
    val nAbove = signs.count(identity).toLong
    val nBelow = n - nAbove
    val expRuns = 2 * nAbove * nBelow * 1000000L / n + 1000000L
    val got = graft.SparkEntry.queries("q366_runs_test")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4), got.getLong(5), got.getLong(6)) ==
      (n, nAbove, nBelow, runs, expRuns, runs * 1000000L - expRuns,
        median))
  }
}
