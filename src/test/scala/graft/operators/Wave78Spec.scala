package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-78 cube / anomaly operators (q343–q344);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave78Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q343 cube contains all four grouping sets consistently") {
    val got = graft.SparkEntry.queries("q343_cube_revenue")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val grand = got.filter(t => t._1 == "__all__" && t._2 == "__all__")
    assert(grand.length == 1)
    val detail = got.filter(t => t._1 != "__all__" && t._2 != "__all__")
    // Every rollup level re-aggregates the detail level exactly.
    assert(detail.map(_._3).sum == grand.head._3)
    assert(detail.map(_._4).sum == grand.head._4)
    val byRegion = got.filter(t => t._1 != "__all__" && t._2 == "__all__")
    byRegion.foreach { case (r, _, n, c) =>
      val d = detail.filter(_._1 == r)
      assert(d.map(_._3).sum == n && d.map(_._4).sum == c)
    }
    val byYear = got.filter(t => t._1 == "__all__" && t._2 != "__all__")
    byYear.foreach { case (_, y, n, c) =>
      val d = detail.filter(_._2 == y)
      assert(d.map(_._3).sum == n && d.map(_._4).sum == c)
    }
  }

  test("q344 matches a sequential chi-square recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nn = BigInt(ev.length)
    val cT = ev.groupBy(_._2).map { case (t, g) => t -> BigInt(g.length) }
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val nU = BigInt(g.length)
      val obs = g.groupBy(_._2).map { case (t, gg) =>
        t -> BigInt(gg.length)
      }
      val chi2 = cT.map { case (t, ct) =>
        val o = obs.getOrElse(t, BigInt(0))
        val diff = o * nn - nU * ct
        diff * diff * 1000000 / (nU * ct * nn)
      }.sum
      (u, g.length.toLong, chi2.toLong)
    }.toSeq.sortBy(t => (-t._3, t._1)).take(20)
    val got = graft.SparkEntry
      .queries("q344_user_profile_anomaly")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == expected && got.nonEmpty)
  }
}
