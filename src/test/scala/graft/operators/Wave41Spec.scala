package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-41 quantile-matching operator (q267) against a
  * sequential recompute; the DuckDB oracle separately hash-checks exact
  * values at the gate SFs.
  */
class Wave41Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q267 quantile matching equals the sequential rank transform") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val globalSorted = ev.map(_._3).sorted
    val nG = globalSorted.length.toLong
    val want = ev.map(_._1).distinct.map { tpe =>
      val typed = ev.filter(_._1 == tpe).sortBy(e => (e._3, e._2))
      val nT = typed.length.toLong
      val matched = typed.zipWithIndex.map { case (_, i) =>
        val j = i.toLong * nG / nT + 1
        globalSorted((j - 1).toInt)
      }
      (tpe, nT, typed.map(_._3).sum, matched.sum, matched.min, matched.max)
    }.toSet
    val got = graft.SparkEntry.queries("q267_quantile_match")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == want)
    // the transform preserves cardinality and the matched values are a
    // monotone re-mapping: per-type means move toward the global one
    assert(got.map(_._2).sum == nG)
  }
}
