package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-93 allocation advisors (q373–q374); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave93Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q373 matches a sequential UCB1 recompute; exactly one arm " +
    "chosen") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("event_type", "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mc = ev.map(_._2).max
    val nn = ev.length.toLong
    val lnN = math.floor(math.log(1.0 * nn) * 1000000).toLong
    val arms = ev.groupBy(_._1).map { case (a, g) =>
      val n = g.length.toLong
      val mean = g.map(_._2 * 1000000L / mc).sum / n
      val bonus = math.floor(math.sqrt(
        ((2 * lnN * 1000000L) / n).toDouble)).toLong
      (a, n, mean, bonus, mean + bonus)
    }.toSeq
    val best = arms.maxBy(t => (t._5, t._1))
    val expected = arms.map(t =>
      (t._1, t._2, t._3, t._4, t._5,
        if (t._5 == best._5 && t._1 == best._1) 1L else 0L)).toSet
    val got = graft.SparkEntry.queries("q373_ucb1_advisor")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected && got.size == 5)
    assert(got.count(_._6 == 1L) == 1)
  }

  test("q374 matches a sequential dead-stock recompute; totals cover " +
    "the catalog") {
    val parts = graft.Tables.table(spark, sf, "part")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sold = graft.Tables.table(spark, sf, "lineitem")
      .selectExpr("l_partkey").collect().map(_.getLong(0)).toSet
    val rev = graft.Tables.table(spark, sf, "lineitem")
      .selectExpr("l_partkey", "CAST(floor(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brandOf = parts.toMap
    val revByBrand = rev.groupBy(t => brandOf(t._1))
      .map { case (b, g) => b -> g.map(_._2).sum }
    val expected = parts.groupBy(_._2).map { case (b, g) =>
      val nDead = g.count(p => !sold(p._1)).toLong
      (b, g.length.toLong, nDead, nDead * 1000000L / g.length,
        revByBrand.getOrElse(b, 0L))
    }.toSet
    val got = graft.SparkEntry.queries("q374_dead_stock_report")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.size == 25)
    assert(got.toSeq.map(_._2).sum == parts.length.toLong)
  }
}
