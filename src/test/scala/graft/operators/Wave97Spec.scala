package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-97 semi-structured / calendar operators
  * (q381–q382); the DuckDB oracle separately hash-checks exact values
  * at the gate SFs.
  */
class Wave97Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q381 matches a sequential JSON-profile recompute; everything " +
    "parses") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("event_type", "props").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val kRe = """\{"k":\s*(-?\d+)\}""".r
    val parsed = ev.map { case (et, p) =>
      (et, p match { case kRe(v) => Some(v.toLong); case _ => None })
    }
    val expected = parsed.groupBy(_._1).map { case (et, g) =>
      val ks = g.flatMap(_._2)
      (et, g.length.toLong, g.count(_._2.isEmpty).toLong,
        ks.min, ks.max, ks.sum * 1000000L / ks.length,
        ks.count(_ >= 50L).toLong * 1000000L / ks.length)
    }.toSet
    val got = graft.SparkEntry
      .queries("q381_json_field_profile")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected && got.size == 5)
    assert(got.forall(_._3 == 0L))
  }

  test("q382 matches a sequential heatmap recompute; exactly one peak") {
    val cells = graft.Tables.table(spark, sf, "events")
      .selectExpr("((ts div 86400000000000) + 4) % 7",
        "(ts div 3600000000000) % 24").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case (c, g) => (c, g.size.toLong) }
    val nAll = cells.values.sum
    val best = cells.maxBy { case ((d, h), n) => (n, d, h) }
    val expected = cells.map { case ((d, h), n) =>
      (d, h, n, n * 1000000L / nAll,
        if ((d, h) == best._1 && n == best._2) 1L else 0L)
    }.toSet
    val got = graft.SparkEntry.queries("q382_activity_heatmap")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.count(_._5 == 1L) == 1)
  }
}
