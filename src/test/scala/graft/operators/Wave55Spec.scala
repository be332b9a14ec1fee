package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-55 planning advisors (q298–q299); the DuckDB
  * oracle separately hash-checks exact values at the gate SFs.
  */
class Wave55Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q298 salt advisor matches a sequential recompute") {
    def keyCounts(t: String, c: String) =
      graft.Tables.table(spark, sf, t).groupBy(c).count().collect()
        .map(r => (r.getString(0), r.getLong(1)))
    val want = Seq(
      ("events.event_type", keyCounts("events", "event_type")),
      ("orders.o_orderpriority", keyCounts("orders", "o_orderpriority")))
      .flatMap { case (kc, counts) =>
        val nt = counts.map(_._2).sum
        val target = nt / 32 + 1
        counts.filter(_._2 > 2 * target).map { case (k, n) =>
          val salt = (n + target - 1) / target
          (kc, k, n, n * 1000000L / nt, salt, n * 1000000L / nt / salt)
        }
      }.toSet
    val got = graft.SparkEntry.queries("q298_salt_advisor")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.nonEmpty) // the 5-value type columns are heavy at width 32
    // Salting must actually level: every advised key lands under
    // twice the uniform share after salting.
    got.foreach { case (_, _, _, _, salt, post) =>
      assert(salt >= 2 && post <= 2 * 1000000L / 32)
    }
  }

  test("q299 session-gap advisor matches a sequential recompute") {
    val rows = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = rows.groupBy(_._1).values.flatMap { g =>
      val ordered = g.toSeq.sortBy(x => (x._3, x._2)).map(_._3)
      ordered.zip(ordered.drop(1)).map { case (a, b) =>
        (b - a) / 1000000000L
      }
    }.toSeq.sorted
    // k-th smallest via the cum*100 >= n*p rule, matching the query.
    def pctRule(p: Int): Long = {
      val n = gaps.size.toLong
      gaps.zipWithIndex
        .find { case (_, i) => (i + 1) * 100 >= n * p }.get._1
    }
    val want = Map(
      "p50_s" -> pctRule(50), "p90_s" -> pctRule(90),
      "p99_s" -> pctRule(99), "max_s" -> gaps.max,
      "n_gaps" -> gaps.size.toLong,
      "advised_gap_s" -> (pctRule(90) + 59) / 60 * 60)
    val got = graft.SparkEntry.queries("q299_session_gap_advisor")(
      spark, sf).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
    assert(want("advised_gap_s") > 0)
  }
}
