package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-82 estimator audits (q351–q352); the DuckDB
  * oracle separately hash-checks exact values at the gate SFs.
  */
class Wave82Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q351 matches a sequential Chao1 recompute; Chao1 >= observed " +
    "types") {
    val freq = graft.Tables.table(spark, sf, "documents")
      .selectExpr("text").collect().map(_.getString(0))
      .flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (_, g) => g.length.toLong }.toSeq
    val dTypes = freq.size.toLong
    val nTokens = freq.sum
    val f1 = freq.count(_ == 1L).toLong
    val f2 = freq.count(_ == 2L).toLong
    val chao1 = dTypes + f1 * f1 / (2 * math.max(1L, f2))
    val got = graft.SparkEntry.queries("q351_chao1_vocab")(spark, sf)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4), got.getLong(5)) ==
      (dTypes, nTokens, f1, f2, chao1, f1 * 1000000L / nTokens))
    assert(got.getLong(4) >= dTypes)
  }

  test("q352 matches a sequential recompute; actual >= uniform " +
    "estimate everywhere (Cauchy-Schwarz)") {
    val cnt = graft.Tables.table(spark, sf, "lineitem")
      .selectExpr("l_partkey").collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val expected = cnt.groupBy(_._1 % 16).map { case (b, g) =>
      val n = g.map(_._2).sum
      val dk = g.size.toLong
      val actual = g.map(t => t._2 * t._2).sum
      val est = n * n / dk
      (b, n, dk, est, actual, (est - actual) * 1000000L / actual)
    }.toSet
    val got = graft.SparkEntry.queries("q352_join_card_audit")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected && got.size == 16)
    assert(got.forall(t => t._5 >= t._4 - t._3))
  }
}
