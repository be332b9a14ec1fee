package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-76 operators (q339–q340); the DuckDB oracle
  * separately hash-checks exact values at the gate SFs.
  */
class Wave76Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q339 matches a sequential multi-source BFS recompute") {
    val eo = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "orders"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("o_custkey * 2", "l_suppkey * 2 + 1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val adj = (eo ++ eo.map(t => (t._2, t._1))).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    val seeds = adj.keys.filter(k => k % 2 == 0 && k < 10).toSeq
    val scores = scala.collection.mutable.Map[Long, (Long, Long)]()
    seeds.foreach { seed =>
      var settled = Set(seed)
      var frontier = Set(seed)
      (1 to 3).foreach { hop =>
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .diff(settled)
        next.foreach { id =>
          val (n, h) = scores.getOrElse(id, (0L, 0L))
          scores(id) = (n + 1, h + 1000000L / hop)
        }
        settled ++= next
        frontier = next
      }
    }
    val expected = scores.toSeq
      .map { case (id, (n, h)) => (id, n, h) }
      .sortBy(t => (-t._3, t._1)).take(20)
    val got = graft.SparkEntry
      .queries("q339_harmonic_centrality")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("q340 streaming M4 equals the batch hourly M4") {
    val batch = graft.Tables.table(spark, sf, "events")
      .selectExpr("ts div 3600000000000 AS h", "ts", "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (h, g) =>
        (h, g.size.toLong, g.map(_._4).min, g.map(_._4).max,
          g.minBy(t => (t._2, t._3))._4, g.maxBy(t => (t._2, t._3))._4)
      }.toSet
    val got = graft.SparkEntry.queries("q340_stream_m4")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == batch && got.nonEmpty)
  }
}
