package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-83 latency/load operators (q353–q354); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave83Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q353 matches a sequential lag-profile recompute") {
    val lags = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "orders"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("o_orderpriority",
        "CAST(datediff(CAST(l_shipdate AS DATE), " +
          "CAST(o_orderdate AS DATE)) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = lags.groupBy(_._1).map { case (p, g) =>
      val vs = g.map(_._2).sorted
      val n = vs.length.toLong
      def q(num: Long, den: Long): Long = {
        var cum = 0L
        var i = 0
        while (i < vs.length) {
          var j = i
          while (j < vs.length && vs(j) == vs(i)) j += 1
          cum += (j - i)
          if (cum * den >= n * num) return vs(i)
          i = j
        }
        vs.last
      }
      (p, n, vs.sum * 1000000L / n, vs.max, q(1, 2), q(9, 10))
    }.toSet
    val got = graft.SparkEntry.queries("q353_ship_lag_profile")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected && got.size == 5)
  }

  test("q354 matches a sequential sweep-line recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 1800L * 1000000000L
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val sorted = g.sortBy(t => (t._2, t._3))
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var s0 = sorted.head._2; var s1 = sorted.head._2
      sorted.tail.foreach { t =>
        if (t._2 - s1 > gap) { buf += ((u, s0, s1)); s0 = t._2 }
        s1 = t._2
      }
      buf += ((u, s0, s1))
      buf
    }
    val deltas = sessions.flatMap { case (u, t0, t1) =>
      Seq((u, t0, 1L), (u, t1 + 1, -1L))
    }
    val expected = deltas.groupBy(_._2 / 86400000000000L)
      .map { case (day, g) =>
        val sorted = g.sortBy(t => (t._2, t._3, t._1))
        var run = 0L; var peak = Long.MinValue
        sorted.foreach { t => run += t._3; peak = math.max(peak, run) }
        (day, peak, g.count(_._3 == 1L).toLong)
      }.toSet
    val got = graft.SparkEntry.queries("q354_peak_concurrency")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }
}
