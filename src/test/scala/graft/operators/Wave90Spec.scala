package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-90 revenue-accounting operators
  * (q367–q368); the DuckDB oracle separately hash-checks exact values
  * at the gate SFs.
  */
class Wave90Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q367 flows reconstruct the month-over-month revenue delta " +
    "exactly") {
    val got = graft.SparkEntry
      .queries("q367_growth_accounting")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // net = sum of the four flows (definitionally)
    got.foreach(t => assert(t._7 == t._3 + t._4 + t._5 + t._6))
    // For consecutive months the flows reconstruct Δrevenue exactly.
    got.sliding(2).foreach {
      case Array(prev, cur) if cur._1 == prev._1 + 1 =>
        assert(cur._7 == cur._2 - prev._2,
          s"month ${cur._1}: net ${cur._7} != delta ${cur._2 - prev._2}")
      case _ =>
    }
  }

  test("q368 matches a sequential benchmark recompute") {
    val rev = graft.Tables.table(spark, sf, "orders")
      .join(graft.Tables.table(spark, sf, "customer"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("CAST(c_nationkey AS BIGINT)",
        "CAST(floor(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (n, g) => (n, g.map(_._2).sum) }.toSeq
    val n = rev.size.toLong
    val sorted = rev.map(_._2).sorted
    def ordStat(vs: Seq[Long]): Long = {
      // min v whose rank*2 >= n (rank = count of values <= v)
      vs.find(v => vs.count(_ <= v) * 2 >= vs.size).get
    }
    val median = ordStat(sorted)
    val mad = ordStat(rev.map(t => math.abs(t._2 - median)).sorted)
    val expected = rev.map { case (nat, r) =>
      val rk = sorted.count(_ <= r).toLong
      (nat, r, rk * 1000000L / n,
        if (mad == 0) 0L else (r - median) * 1000000L / mad)
    }.toSet
    val got = graft.SparkEntry.queries("q368_nation_benchmark")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.size == 25)
  }
}
