package graft.operators

import java.math.{BigDecimal => JBD, MathContext}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-37 multi-join OLAP shapes (q257–q259): plan
  * pinning (pushed filters, broadcast dims, no cartesian) plus
  * decimal-exact sequential recomputes; the DuckDB oracle separately
  * hash-checks values at the gate SFs.
  */
class Wave37Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  /** double → DECIMAL(18,2) the way both engines cast (HALF_UP). */
  private def d2(v: Double): JBD =
    new JBD(v, MathContext.DECIMAL64).setScale(2, java.math.RoundingMode.HALF_UP)

  private def rev(price: Double, disc: Double): JBD =
    d2(price).multiply(JBD.ONE.subtract(d2(disc)))

  test("q257 plan pushes filters, broadcasts the dim, no cartesian") {
    val df = graft.SparkEntry.queries("q257_unshipped_revenue")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(c_mktsegment,BUILDING)"))
    val rows = df.collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q258 matches a decimal-exact sequential recompute") {
    import org.apache.spark.sql.functions.col
    def t(n: String) = graft.Tables.table(spark, sf, n)
    val asiaNations = t("nation").join(t("region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sup = t("supplier")
      .selectExpr("CAST(s_suppkey AS BIGINT)",
        "CAST(s_nationkey AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cus = t("customer")
      .selectExpr("CAST(c_custkey AS BIGINT)",
        "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ord = t("orders").filter(
        "o_orderdate >= TIMESTAMP '1997-01-01' AND " +
          "o_orderdate < TIMESTAMP '1998-01-01'")
      .selectExpr("CAST(o_orderkey AS BIGINT)",
        "CAST(o_custkey AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val acc = collection.mutable.Map[String, JBD]()
    t("lineitem")
      .selectExpr("CAST(l_orderkey AS BIGINT)", "CAST(l_suppkey AS BIGINT)",
        "l_extendedprice", "l_discount")
      .collect().foreach { r =>
        for {
          custkey <- ord.get(r.getLong(0))
          snat <- sup.get(r.getLong(1))
          cnat <- cus.get(custkey)
          if cnat == snat
          nname <- asiaNations.get(snat)
        } acc(nname) = acc.getOrElse(nname, JBD.ZERO)
          .add(rev(r.getDouble(2), r.getDouble(3)))
      }
    val want = acc.view.mapValues(_.doubleValue).toMap
    val got = graft.SparkEntry.queries("q258_local_supplier_volume")(
      spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("q259 top-20 is consistent and dim join-back is correct") {
    val rows = graft.SparkEntry.queries("q259_returned_revenue")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getString(4)))
    assert(rows.length <= 20)
    assert(rows.map(_._1).distinct.length == rows.length)
    val cust = graft.Tables.table(spark, sf, "customer")
      .selectExpr("CAST(c_custkey AS BIGINT)", "c_name", "c_acctbal",
        "CAST(c_nationkey AS BIGINT)")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2),
        r.getLong(3))).toMap
    rows.foreach { case (ck, name, _, bal, _) =>
      val (wName, wBal, _) = cust(ck)
      assert(name == wName && bal == wBal)
    }
  }
}
