package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-49 LTV operator (q281) against a sequential
  * recompute; the DuckDB oracle separately hash-checks exact values at
  * the gate SFs.
  */
class Wave49Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q281 cohort LTV matches a sequential recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 604800000000000L,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val cells = ev.map { case (u, wk, c) =>
      ((cohort(u), wk - cohort(u)), c)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = cells.keys.map(_._1).toSeq.distinct.flatMap { cw =>
      val ages = cells.collect { case ((c, a), v) if c == cw => (a, v) }
        .toSeq.sortBy(_._1)
      val cums = ages.scanLeft(0L)(_ + _._2).tail
      ages.zip(cums).map { case ((a, v), cum) =>
        (cw, a, sizes(cw), v, cum, cum / sizes(cw))
      }
    }.toSet
    val got = graft.SparkEntry.queries("q281_cohort_ltv")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == want)
    // LTV is monotone in age within every cohort
    got.groupBy(_._1).foreach { case (_, g) =>
      val s = g.toSeq.sortBy(_._2)
      assert(s.lazyZip(s.drop(1)).forall((a, b) => a._5 <= b._5))
    }
  }
}
