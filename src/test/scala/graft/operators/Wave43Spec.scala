package graft.operators

import java.math.{BigDecimal => JBD, MathContext}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-43 report shapes (q271–q272) against
  * decimal-exact sequential recomputes; the DuckDB oracle separately
  * hash-checks exact values at the gate SFs.
  */
class Wave43Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def d2(v: Double): JBD =
    new JBD(v, MathContext.DECIMAL64)
      .setScale(2, java.math.RoundingMode.HALF_UP)

  /** supplier-keyed EXACT DECIMAL revenue from a sequential scan; the
    * floor-to-cents happens at each query's own grouping grain. */
  private lazy val revBySup: Map[Long, JBD] = {
    val sup = graft.Tables.table(spark, sf, "lineitem")
      .selectExpr("CAST(l_suppkey AS BIGINT)", "l_extendedprice",
        "l_discount").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    sup.groupBy(_._1).view.mapValues { g =>
      g.map { case (_, p, disc) =>
        d2(p).multiply(JBD.ONE.subtract(d2(disc)))
      }.reduce(_ add _)
    }.toMap
  }

  private def floorCents(v: JBD): Long =
    v.movePointRight(2).setScale(0, java.math.RoundingMode.FLOOR)
      .longValueExact()

  test("q271 top-2 + OTHERS matches a sequential recompute") {
    val supMeta = graft.Tables.table(spark, sf, "supplier")
      .selectExpr("CAST(s_suppkey AS BIGINT)", "s_name",
        "CAST(s_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nations = graft.Tables.table(spark, sf, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = supMeta.filter(sm => revBySup.contains(sm._1))
      .groupBy(_._3).flatMap { case (nk, sups) =>
        val ranked = sups
          .map(sm => (sm._1, sm._2, floorCents(revBySup(sm._1))))
          .sortBy { case (sk, _, rev) => (-rev, sk) }
        val (top, rest) = ranked.splitAt(2)
        val natTotal = ranked.map(_._3).sum
        val rows = top.map { case (_, name, rev) => (name, rev) } ++
          (if (rest.nonEmpty) Seq(("OTHERS", rest.map(_._3).sum)) else Nil)
        rows.toSeq.map { case (entity, rev) =>
          (nations(nk), entity, rev, rev * 1000000L / natTotal)
        }
      }.toSet
    val got = graft.SparkEntry.queries("q271_topk_others")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("q272 hierarchy shares match a sequential recompute") {
    val supNat = graft.Tables.table(spark, sf, "supplier")
      .selectExpr("CAST(s_suppkey AS BIGINT)", "CAST(s_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natMeta = graft.Tables.table(spark, sf, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name",
        "CAST(n_regionkey AS BIGINT)").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val regions = graft.Tables.table(spark, sf, "region")
      .selectExpr("CAST(r_regionkey AS BIGINT)", "r_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perNation = revBySup.toSeq
      .map { case (sk, rev) => (supNat(sk), rev) }
      .groupBy(_._1).view
      .mapValues(g => floorCents(g.map(_._2).reduce(_ add _))).toMap
    val grand = perNation.values.sum
    val perRegion = perNation.toSeq
      .map { case (nk, rev) => (natMeta(nk)._2, rev) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = perNation.map { case (nk, rev) =>
      val (nName, rk) = natMeta(nk)
      (regions(rk), nName, rev, rev * 1000000L / perRegion(rk),
        perRegion(rk) * 1000000L / grand)
    }.toSet
    val got = graft.SparkEntry.queries("q272_hierarchy_shares")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want)
    // shares are consistent: per-region nation shares sum to ≤ 1e6
    got.groupBy(_._1).foreach { case (_, g) =>
      val tot = g.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - g.size)
    }
  }
}
