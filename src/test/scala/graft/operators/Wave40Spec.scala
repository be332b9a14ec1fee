package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-40 operators (q265–q266) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave40Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q265 encoding advisor matches a sequential recompute") {
    val cols = Seq(("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
      ("customer", "c_mktsegment"), ("customer", "c_name"),
      ("part", "p_type"), ("part", "p_brand"),
      ("documents", "lang"), ("documents", "source"),
      ("events", "event_type"))
    val want = cols.map { case (t, c) =>
      val vs = graft.Tables.table(spark, sf, t)
        .selectExpr(s"CAST($c AS STRING)").collect().map(_.getString(0))
      val n = vs.length.toLong
      val byV = vs.groupBy(identity)
      val ndv = byV.size.toLong
      val plain = vs.map(_.length.toLong).sum
      val dict = byV.keys.toSeq.map(_.length.toLong).sum
      val bits = java.lang.Long.toBinaryString(ndv - 1).length.toLong
      val dictTotal = dict + (n * bits + 7) / 8
      (s"$t.$c", n, ndv, plain, dict, bits, dictTotal,
        dictTotal * 1000000L / plain)
    }.toSet
    val got = graft.SparkEntry.queries("q265_encoding_advisor")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == want)
    // dictionary wins on the low-cardinality enum, loses on the
    // per-row-unique name column
    val byName = got.map(r => r._1 -> r._8).toMap
    assert(byName("orders.o_orderpriority") < 1000000L)
    assert(byName("customer.c_name") > 1000000L)
  }

  test("q266 median imputation matches a sequential recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val want = ev.map(_._2).distinct.map { tpe =>
      val present = ev.filter(e => e._2 == tpe && e._1 % 7 != 0).map(_._3)
      val missing = ev.count(e => e._2 == tpe && e._1 % 7 == 0).toLong
      val sorted = present.sorted
      val med = sorted(((present.length + 1) / 2 - 1).toInt)
      (tpe, present.length.toLong, missing, med,
        present.sum + missing * med)
    }.toSet
    val got = graft.SparkEntry.queries("q266_median_impute")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
  }
}
