package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-74 serving-layer series operators
  * (q335–q336); the DuckDB oracle separately hash-checks exact values
  * at the gate SFs.
  */
class Wave74Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .selectExpr("user_id", "ts", "event_id", "event_type",
      "CAST(floor(value * 100) AS BIGINT)").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getLong(4)))

  test("q335 matches a sequential M4 recompute and preserves global " +
    "extremes") {
    val t0 = events.map(_._2).min; val t1 = events.map(_._2).max
    val expected = events.groupBy(t =>
      (t._2 - t0) * 100 / (t1 - t0 + 1)).map { case (b, g) =>
      val first = g.minBy(t => (t._2, t._3))
      val last = g.maxBy(t => (t._2, t._3))
      (b, g.size.toLong, g.map(_._5).min, g.map(_._5).max,
        first._5, last._5)
    }.toSet
    val got = graft.SparkEntry.queries("q335_m4_downsample")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // M4 guarantee: the global min/max survive downsampling.
    assert(got.map(_._3).min == events.map(_._5).min)
    assert(got.map(_._4).max == events.map(_._5).max)
  }

  test("q336 matches a sequential latency-decile recompute; deciles " +
    "are nondecreasing") {
    val per = events.groupBy(_._1).map { case (u, g) =>
      val touch = g.filter(_._4 != "purchase").map(_._2)
      val buy = g.filter(_._4 == "purchase").map(_._2)
      (u, touch.sorted.headOption, buy.sorted.headOption)
    }
    val lats = per.flatMap {
      case (_, Some(t), Some(b)) if b > t =>
        Some((b - t) / 60000000000L)
      case _ => None
    }.toSeq
    val nConv = lats.size.toLong
    val nPf = per.count {
      case (_, t, Some(b)) => t.isEmpty || b <= t.get
      case _ => false
    }.toLong
    val nNp = per.count(_._3.isEmpty).toLong
    val h = lats.groupBy(identity).map { case (v, g) =>
      (v, g.size.toLong)
    }.toSeq.sortBy(_._1)
    val cums = h.scanLeft(0L)(_ + _._2).drop(1)
    val expected = (1 to 9).map { j =>
      val q = h(cums.indexWhere(c => c * 10 >= nConv * j))._1
      (j.toLong, q, nConv, nPf, nNp)
    }.toSet
    val got = graft.SparkEntry
      .queries("q336_conversion_latency_deciles")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == expected && got.size == 9)
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted)
  }
}
