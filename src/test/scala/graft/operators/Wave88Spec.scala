package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-88 engagement profiles (q363–q364); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave88Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .selectExpr("user_id", "ts", "event_id", "event_type").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q363 matches a sequential session-depth recompute") {
    val gap = 1800L * 1000000000L
    val depths = events.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(t => (t._2, t._3))
      val buf = scala.collection.mutable.ArrayBuffer[Long]()
      var n = 0L; var prev = Long.MinValue
      sorted.foreach { t =>
        if (prev != Long.MinValue && t._2 - prev > gap) { buf += n; n = 0 }
        n += 1; prev = t._2
      }
      buf += n
      buf
    }.toSeq
    val nAll = depths.size.toLong
    val expected = depths.groupBy(d => math.min(10L, d)).map {
      case (b, g) =>
        (b, g.size.toLong, g.sum, g.size.toLong * 1000000L / nAll)
    }.toSet
    val got = graft.SparkEntry
      .queries("q363_session_depth_profile")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q364 matches a sequential overdue-factor recompute") {
    val maxS = events.map(_._2 / 1000000000L).max
    val factors = events.filter(_._4 == "purchase").groupBy(_._1)
      .values.flatMap { g =>
        if (g.length < 2) None
        else {
          val ss = g.map(_._2 / 1000000000L)
          val gapMean = (ss.max - ss.min) / (g.length - 1)
          if (gapMean <= 0) None
          else Some((maxS - ss.max) * 1000000L / gapMean)
        }
      }.toSeq
    val nAll = factors.size.toLong
    val expected = factors.groupBy(f => math.min(8L, f / 500000L))
      .map { case (b, g) =>
        (b, g.size.toLong, g.min, g.max, g.size.toLong * 1000000L / nAll)
      }.toSet
    val got = graft.SparkEntry
      .queries("q364_overdue_customers")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }
}
