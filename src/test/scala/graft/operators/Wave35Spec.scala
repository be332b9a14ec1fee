package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-35 schema-discovery operators (q253–q254)
  * against independent sequential recomputes; the DuckDB oracle
  * separately hash-checks exact values at the gate SFs.
  */
class Wave35Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q253 FD discovery matches a sequential recompute") {
    val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority",
      "o_orderdate", "o_totalprice")
    val rows = graft.Tables.table(spark, sf, "orders")
      .selectExpr(cols.map(c => s"CAST($c AS STRING) AS $c"): _*)
      .collect()
      .map(r => cols.zipWithIndex.map { case (c, i) =>
        c -> r.getString(i)
      }.toMap)
    val want = (for { x <- cols; y <- cols if x != y } yield {
      val groups = rows.groupBy(_(x)).view
        .mapValues(_.map(_(y)).distinct.length).toMap
      val nViol = groups.values.count(_ > 1).toLong
      (x, y, groups.size.toLong, nViol,
        groups.values.max.toLong, if (nViol == 0) 1L else 0L)
    }).toSet
    val got = graft.SparkEntry.queries("q253_fd_discovery")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == want)
    // all 20 ordered non-reflexive pairs present, holds ⇔ no violations
    assert(got.size == 20 && got.forall(r => r._1 != r._2))
    assert(got.forall(r => (r._6 == 1L) == (r._4 == 0L)))
  }

  test("q254 key discovery matches a sequential recompute") {
    val combos = Seq(
      Seq("l_orderkey"), Seq("l_partkey"), Seq("l_suppkey"),
      Seq("l_orderkey", "l_linenumber"),
      Seq("l_orderkey", "l_partkey"),
      Seq("l_partkey", "l_suppkey"),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
    val all = combos.flatten.distinct
    val rows = graft.Tables.table(spark, sf, "lineitem")
      .selectExpr(all.map(c => s"CAST($c AS STRING) AS $c"): _*)
      .collect()
      .map(r => all.zipWithIndex.map { case (c, i) =>
        c -> r.getString(i)
      }.toMap)
    val want = combos.map { cs =>
      val hist = rows.groupBy(r => cs.map(r(_)).mkString("|")).view
        .mapValues(_.length.toLong).toMap
      val n = rows.length.toLong
      val nd = hist.size.toLong
      (cs.mkString("+"), n, nd, n - nd, hist.values.max,
        if (n == nd) 1L else 0L)
    }.toSet
    val got = graft.SparkEntry.queries("q254_key_discovery")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == want)
    // is_key is consistent with the exact duplication accounting, and
    // the synthetic generator does NOT honor TPC-H's declared
    // (l_orderkey, l_linenumber) PK — the audit must report that
    assert(got.forall(r => (r._6 == 1L) == (r._4 == 0L)))
    assert(got.exists(r => r._1 == "l_orderkey+l_linenumber" && r._6 == 0L))
  }
}
