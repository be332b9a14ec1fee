package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components contract: hash-min propagation equals the true
  * transitive closure, for both the to-convergence operator and the
  * plan-pure fixed-round variant used by q87.
  */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def compMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("to-convergence CC solves a long chain plus separate clique") {
    import spark.implicits._
    // chain 1-2-3-...-10 (diameter 9) + clique {20,21,22} + pair {30,31}
    val chain = (1L until 10L).map(i => (i, i + 1))
    val edges = (chain ++ Seq((20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L))).toDF("a_id", "b_id")
    val comp = compMap(GraphOps.connectedComponents(edges))
    (1L to 10L).foreach(i => assert(comp(i) == 1L, s"node $i"))
    Seq(20L, 21L, 22L).foreach(i => assert(comp(i) == 20L))
    assert(comp(30L) == 30L && comp(31L) == 30L)
  }

  test("fixed-round CC is exact once rounds reach the diameter") {
    import spark.implicits._
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // 3 rounds cannot traverse a diameter-7 chain: min label has not
    // reached the far end yet...
    val early = compMap(GraphOps.connectedComponentsFixed(chain, 3))
    assert(early(8L) != 1L)
    // ...7 rounds can.
    val full = compMap(GraphOps.connectedComponentsFixed(chain, 7))
    (1L to 8L).foreach(i => assert(full(i) == 1L))
  }

  test("q87's 6 rounds have converged on the real LSH-pair graph") {
    val sf = "/root/testdata/sf0.001"
    val fixedQ = compMap(GraphOps.queries("q87_neardup_clusters")(
      spark, sf))
    val conv = compMap(
      GraphOps.connectedComponents(TextOps.lshPairs(spark, sf)))
    assert(fixedQ == conv,
      "fixed 6 rounds disagree with converged components")
    assert(fixedQ.nonEmpty)
    // every component id is itself a member and the component minimum
    fixedQ.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.min == cid)
    }
  }

  test("q136 graph stats match a Scala recomputation on the LSH pairs") {
    val sf = "/root/testdata/sf0.001"
    val pairs = TextOps.lshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val expected = adj.map { case (n, nbrs) =>
      val deg = nbrs.size.toLong
      // triangles at n = adjacent neighbor pairs
      val tri = nbrs.toSeq.combinations(2).count {
        case Seq(x, y) => adj(x).contains(y)
      }.toLong
      val cc = if (deg >= 2) 2000000L * tri / (deg * (deg - 1)) else 0L
      n -> ((deg, tri, cc))
    }
    val got = GraphOps.queries("q136_dup_graph_stats")(spark, sf)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // handshake: total triangle incidences divide by 3
    assert(got.values.map(_._2).sum % 3 == 0)
  }

  test("q139 keeps the highest-TTR member of every duplicate family") {
    val sf = "/root/testdata/sf0.001"
    val comp = compMap(GraphOps.queries("q87_neardup_clusters")(spark, sf))
    val ttr = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().flatMap { r =>
        val t = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        if (t.isEmpty) None
        else Some(r.getLong(0) -> t.distinct.length.toLong * 1000000L / t.length)
      }.toMap
    val families = ttr.keys.groupBy(id => comp.getOrElse(id, id))
    val expected = families.map { case (fam, members) =>
      val keep = members.minBy(id => (-ttr(id), id))
      fam -> ((keep, ttr(keep), members.size.toLong))
    }
    val got = GraphOps.queries("q139_canonical_pick")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // at least one real (multi-doc) family must exist at sf0.001
    assert(got.values.exists(_._3 > 1))
  }

  test("q146 wedge pairs match a Scala recomputation") {
    val sf = "/root/testdata/sf0.001"
    val pairs = TextOps.lshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val expected = adj.values.toSeq.flatMap { nbrs =>
      nbrs.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) }
    }.groupBy(identity).map { case (p, ws) =>
      p -> ((ws.size.toLong, pairs.contains(p)))
    }
    val got = GraphOps.queries("q146_missed_neighbors")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
