package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-73 marketing-analytics operators
  * (q333–q334); the DuckDB oracle separately hash-checks exact values
  * at the gate SFs.
  */
class Wave73Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .selectExpr("user_id", "ts", "event_id", "event_type").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q333 matches a sequential attribution recompute; first and " +
    "last counts agree per conversion") {
    val conv = events.filter(_._4 == "purchase")
    val touch = events.filter(_._4 != "purchase")
    val byUser = touch.groupBy(_._1)
    val win = 7L * 86400000000000L
    case class Agg(var n: Long = 0, var first: Long = 0,
      var last: Long = 0, var credit: Long = 0)
    val agg = scala.collection.mutable.Map[String, Agg]()
    var nAttributed = 0L
    conv.foreach { case (u, pts, _, _) =>
      val ts = byUser.getOrElse(u, Array.empty)
        .filter(t => t._2 < pts && t._2 >= pts - win)
      if (ts.nonEmpty) {
        nAttributed += 1
        val k = ts.length.toLong
        val fst = ts.minBy(t => (t._2, t._3))
        val lst = ts.maxBy(t => (t._2, t._3))
        ts.foreach { t =>
          val a = agg.getOrElseUpdate(t._4, Agg())
          a.n += 1
          a.credit += 1000000L / k
          if (t == fst) a.first += 1
          if (t == lst) a.last += 1
        }
      }
    }
    val expected = agg.map { case (c, a) =>
      (c, a.n, a.first, a.last, a.credit)
    }.toSet
    val got = graft.SparkEntry
      .queries("q333_touch_attribution")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // Each attributed conversion has exactly one first and one last.
    assert(got.toSeq.map(_._3).sum == nAttributed)
    assert(got.toSeq.map(_._4).sum == nAttributed)
  }

  test("q334 matches a sequential retention recompute; offset 0 is " +
    "always 1e6") {
    val wk = 604800000000000L
    val act = events.map(t => (t._1, t._2 / wk)).distinct
    val cohort = act.groupBy(_._1).map { case (u, g) =>
      u -> g.map(_._2).min
    }
    val size = cohort.values.groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val expected = act.groupBy(t => (cohort(t._1), t._2 - cohort(t._1)))
      .map { case ((cw, off), g) =>
        val n = g.size.toLong
        (cw, off, n, size(cw), n * 1000000L / size(cw))
      }.toSet
    val got = graft.SparkEntry
      .queries("q334_retention_triangle")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.filter(_._2 == 0L).forall(_._5 == 1000000L))
  }
}
