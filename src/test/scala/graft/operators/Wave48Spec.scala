package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-48 Markov-eval operator (q280) against a
  * sequential recompute; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave48Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q280 Markov eval matches a sequential train/test recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tmin = ev.map(_._2).min
    val tmax = ev.map(_._2).max
    val cut = tmin + (tmax - tmin) / 2
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val s = g.sortBy(e => (e._2, e._3))
      s.zip(s.tail).map { case (a, b) => (a._4, b._4, a._2 < cut) }
    }
    val model = trans.filter(_._3).groupBy(t => (t._1, t._2)).view
      .mapValues(_.size).toSeq
      .map { case ((f, t), n) => (f, t, n) }
      .groupBy(_._1).view.mapValues(g =>
        g.minBy(x => (-x._3, x._2))._2).toMap
    val want = trans.filterNot(_._3)
      .filter(t => model.contains(t._1))
      .groupBy(_._1).map { case (f, g) =>
        val pred = model(f)
        val hits = g.count(_._2 == pred).toLong
        (f, pred, g.size.toLong, hits, hits * 1000000L / g.size)
      }.toSet
    val got = graft.SparkEntry.queries("q280_markov_eval")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want)
    // train/test transitions partition the full set
    assert(trans.count(_._3) + trans.count(!_._3) == trans.size)
  }
}
