package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-96 physical-design operators (q379–q380);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave96Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q379 matches a sequential fan-out recompute; orders and lines " +
    "reconcile") {
    val orders = graft.Tables.table(spark, sf, "orders")
      .selectExpr("o_orderkey").collect().map(_.getLong(0))
    val lines = graft.Tables.table(spark, sf, "lineitem")
      .selectExpr("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val fans = orders.map(o => lines.getOrElse(o, 0L))
    val nAll = fans.length.toLong
    val expected = fans.groupBy(k => math.min(10L, k)).map {
      case (b, g) =>
        (b, g.length.toLong, g.sum, g.length.toLong * 1000000L / nAll)
    }.toSet
    val got = graft.SparkEntry
      .queries("q379_join_fanout_profile")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.toSeq.map(_._2).sum == nAll)
    assert(got.toSeq.map(_._3).sum == lines.values.sum)
  }

  test("q380 matches a sequential weighted-median recompute; the " +
    "weighted median covers half the quantity") {
    val rows = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "part"),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("p_brand",
        "CAST(floor(l_extendedprice * 100) AS BIGINT) div " +
          "CAST(floor(l_quantity) AS BIGINT)",
        "CAST(floor(l_quantity) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (b, g) =>
      val tw = g.map(_._3).sum
      val tc = g.length.toLong
      val byPrice = g.groupBy(_._2).map { case (u, gg) =>
        (u, gg.map(_._3).sum, gg.length.toLong)
      }.toSeq.sortBy(_._1)
      def cut(sel: ((Long, Long, Long)) => Long, tot: Long): Long = {
        var cum = 0L
        byPrice.find { t => cum += sel(t); cum * 2 >= tot }.get._1
      }
      (b, tc, tw, cut(_._2, tw), cut(_._3, tc))
    }.toSet
    val got = graft.SparkEntry
      .queries("q380_weighted_median_price")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.size == 25)
    // Coverage property of the weighted median.
    got.foreach { case (b, _, tw, wm, _) =>
      val covered = rows.filter(_._1 == b).filter(_._2 <= wm)
        .map(_._3).sum
      assert(covered * 2 >= tw)
    }
  }
}
