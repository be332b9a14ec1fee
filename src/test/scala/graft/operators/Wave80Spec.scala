package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-80 data-quality gates (q347–q348); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave80Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q347 matches a sequential conformance recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("value", "event_type", "user_id", "props", "ts")
      .collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3), r.getLong(4)))
    val enum5 = Set("click", "error", "purchase", "signup", "view")
    val n = ev.length.toLong
    val checks = Seq(
      ("value_nonneg", ev.count(_._1 >= 0).toLong),
      ("value_under_1k", ev.count(_._1 < 1000).toLong),
      ("type_in_enum", ev.count(t => enum5(t._2)).toLong),
      ("user_id_nonneg", ev.count(_._3 >= 0).toLong),
      ("props_present",
        ev.count(t => t._4 != null && t._4.nonEmpty).toLong),
      ("ts_in_window", ev.count(t =>
        t._5 >= 1577836800000000000L &&
          t._5 < 1893456000000000000L).toLong))
    val expected = checks.map { case (nm, p) =>
      (nm, n, p, p * 1000000L / n, if (p == n) "pass" else "fail")
    }.toSet
    val got = graft.SparkEntry
      .queries("q347_contract_conformance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
      .toSet
    assert(got == expected && got.size == 6)
  }

  test("q348 reports zero orphans on the generated star schema and " +
    "correct child counts") {
    val got = graft.SparkEntry
      .queries("q348_fk_integrity_report")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length == 7)
    // The generator emits a closed star schema — every edge clean.
    assert(got.forall(t => t._3 == 0L && t._4 == 0L))
    val m = got.map(t => t._1 -> t._2).toMap
    assert(m("lineitem->orders") ==
      graft.Tables.table(spark, sf, "lineitem").count())
    assert(m("nation->region") == 25L)
  }
}
