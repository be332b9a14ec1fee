package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-36 operators (q255–q256); the DuckDB oracle
  * separately hash-checks exact values at the gate SFs.
  */
class Wave36Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q255 classifies the known column shapes and ppm sums to ~1e6") {
    val rows = graft.SparkEntry.queries("q255_semantic_types")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byCol = rows.groupBy(_._1)
    // dominant class per column matches the column's real shape
    val dominant = byCol.view.mapValues(_.maxBy(_._3)._2).toMap
    assert(dominant("customer.c_custkey") == "int")
    assert(dominant("customer.c_acctbal") == "decimal")
    assert(dominant("customer.c_name") == "id_tag")
    assert(dominant("orders.o_orderdate") == "datetime")
    assert(dominant("documents.lang") == "code2")
    assert(dominant("events.props") == "json")
    assert(dominant("events.event_type") == "word_text")
    assert(dominant("part.p_name") == "word_text")
    assert(dominant("documents.source") == "other")
    // ppm shares partition each column (floor division loses <1ppm/class)
    byCol.foreach { case (_, g) =>
      val tot = g.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - g.length)
    }
  }

  test("q256 PPR matches a sequential recompute and favors the cohort") {
    val eo = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "orders"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr("o_custkey * 2 AS src", "l_suppkey * 2 + 1 AS dst")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = eo ++ eo.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val seeds = graft.Tables.table(spark, sf, "customer")
      .filter("c_mktsegment = 'BUILDING'")
      .selectExpr("c_custkey * 2 AS id").collect().map(_.getLong(0)).toSet
    val t = 1000000000000L / seeds.size
    val bonus = t * 15 / 100
    var rank: Map[Long, Long] = seeds.map(_ -> t).toMap
    (1 to 3).foreach { _ =>
      val inflow = edges.flatMap { case (s0, d0) =>
        rank.get(s0).map(r => d0 -> r / deg(s0))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = (inflow.keySet ++ seeds).map { id =>
        id -> (inflow.getOrElse(id, 0L) * 85 / 100 +
          (if (seeds(id)) bonus else 0L))
      }.toMap
    }
    val want = rank.toSeq.filter(_._2 > 0)
      .sortBy { case (id, r) => (-r, id) }.take(20)
      .map { case (id, r) =>
        ((if (id % 2 == 0) "c" else "s") + (id / 2), r)
      }
    val got = graft.SparkEntry.queries("q256_personalized_pagerank")(
      spark, sf).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}
