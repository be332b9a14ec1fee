package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-59 distributional operators (q306–q307); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave59Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q306 per-segment KS matches a sequential recompute") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .selectExpr("source", "CAST(n_chars AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val values = docs.map(_._2).distinct.sorted
    val want = docs.map(_._1).distinct.map { src =>
      val mine = docs.filter(_._1 == src).map(_._2)
      val others = docs.filter(_._1 != src).map(_._2)
      var best = 0L
      var at = Long.MaxValue
      values.foreach { v =>
        val a = mine.count(_ <= v).toLong * 1000000L / mine.length
        val b = others.count(_ <= v).toLong * 1000000L / others.length
        val diff = math.abs(a - b)
        if (diff > best) { best = diff; at = v }
        else if (diff == best && v < at) ()
      }
      // smallest attaining value
      val atMin = values.filter { v =>
        val a = mine.count(_ <= v).toLong * 1000000L / mine.length
        val b = others.count(_ <= v).toLong * 1000000L / others.length
        math.abs(a - b) == best
      }.min
      (src, best, atMin)
    }.toSet
    val got = graft.SparkEntry.queries("q306_segment_drift_scan")(
      spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("q307 QTE matches a sequential recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id % 2 AS t",
        "CAST(floor(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def quantiles(arm: Long): Map[Long, Long] = {
      val vs = ev.filter(_._1 == arm).map(_._2).sorted
      val n = vs.length.toLong
      (1L to 9L).map { d =>
        d -> vs(vs.indices.find(i => (i + 1) * 10 >= n * d).get)
      }.toMap
    }
    val q1 = quantiles(1); val q0 = quantiles(0)
    val want = (1L to 9L)
      .map(d => (d, q1(d), q0(d), q1(d) - q0(d))).toSet
    val got = graft.SparkEntry.queries("q307_quantile_treatment_effect")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }
}
