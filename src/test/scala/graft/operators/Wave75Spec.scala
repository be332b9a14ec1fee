package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-75 scorecard operators (q337–q338); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave75Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q337 matches a sequential elasticity recompute") {
    val rows = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "part"),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("p_brand",
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)",
        "CAST(floor(l_quantity) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0),
        math.floor(math.log(1.0 * r.getLong(1)) * 1000000).toLong,
        math.floor(math.log(1.0 * r.getLong(2)) * 1000000).toLong))
    val expected = rows.groupBy(_._1).flatMap { case (b, g) =>
      if (g.length < 2) None
      else {
        val n = BigInt(g.length)
        val sx = g.map(t => BigInt(t._2)).sum
        val sy = g.map(t => BigInt(t._3)).sum
        val sxx = g.map(t => BigInt(t._2) * t._2).sum
        val sxy = g.map(t => BigInt(t._2) * t._3).sum
        Some((b, g.length.toLong,
          ((n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)).toLong))
      }
    }.toSet
    val got = graft.SparkEntry
      .queries("q337_price_elasticity")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q338 matches a sequential readability recompute") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val per = docs.map { case (src, text) =>
      val sents = text.split("\\.").count(_.trim.nonEmpty).toLong
      val ws = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val sylls = ws.map(w =>
        math.max(1, w.split("[^aeiou]+").count(_.nonEmpty)).toLong).sum
      (src, sents, ws.length.toLong, sylls)
    }.filter(t => t._2 > 0 && t._3 > 0)
    val expected = per.groupBy(_._1).map { case (src, g) =>
      val sents = g.map(_._2).sum; val words = g.map(_._3).sum
      val sylls = g.map(_._4).sum
      (src, g.size.toLong, sents, words, sylls,
        206835000L - 1015000L * words / sents - 84600000L * sylls / words)
    }.toSet
    val got = graft.SparkEntry
      .queries("q338_readability_scorecard")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }
}
