package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The shared iterative-loop driver: lineage stays bounded at depth,
  * superseded blocks are released, and the checkpointed form computes
  * exactly what the persist-only form computes.
  */
class GraphIterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  /** Small deterministic multigraph-free edge set: 50 nodes, ring +
    * mod-7 chords, symmetrized and distinct like the production graph
    * builds. */
  private def graph(): (DataFrame, DataFrame) = {
    val eo = spark.range(200)
      .selectExpr("id % 50 AS src", "(id * 7 + 13) % 50 AS dst")
      .filter(col("src") =!= col("dst"))
      .distinct()
    val edges = eo
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    deg.count()
    (edges, deg)
  }

  test("pagerank at depth 12: periodic checkpointing == persist-only") {
    val (edges, deg) = graph()
    // Production path: GraphIter with a checkpoint every 3 rounds.
    val ck = AnalyticsOps.pagerank(edges, deg, rounds = 12,
        checkpointEvery = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Reference: the identical round body, plain persist each round,
    // no checkpoint ever (the pre-GraphIter shape).
    var rank = deg.select(col("src").as("id"), lit(1000000L).as("r"))
    (1 to 12).foreach { _ =>
      val divided = rank.join(deg, rank("id") === deg("src"))
        .select(col("src"), expr("r div deg").as("share"))
      rank = edges.join(divided, "src")
        .groupBy("dst").agg(sum("share").as("m"))
        .select(col("dst").as("id"),
          (lit(150000L) + expr("(m * 85) div 100")).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val ref = rank.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ck == ref)
    assert(ck.nonEmpty)
    edges.unpersist(); deg.unpersist()
  }

  test("self-referencing step at depth 10: plan stays O(1), blocks released") {
    // The worst case for lineage: a step that reads its input TWICE
    // (self-join), which doubles an uncheckpointed plan every round —
    // 2^10 subtree copies by round 10. v doubles each round, so the
    // expected output is exact.
    val init = spark.range(8).selectExpr("id", "id + 1 AS v")
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = GraphIter.run(init, rounds = 10, checkpointEvery = 2,
        GraphIter.Eager) { (df, _) =>
      df.as("a")
        .join(df.select(col("id"), col("v").as("w")).as("b"), "id")
        .select(col("id"), (col("a.v") + col("b.w")).as("v"))
    }
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 8L).map(i => (i, (i + 1) * 1024L)).toSet
    assert(got == want)
    // Lineage: the final frame's plan hangs off the round-8 checkpoint
    // leaf, not 10 rounds of nested self-joins — its rendered tree is
    // bounded (an unbounded form would be thousands of lines).
    val planLines = out.queryExecution.analyzed.treeString.linesIterator.size
    assert(planLines < 60, s"plan unexpectedly deep: $planLines lines")
    // Storage: superseded checkpoints and intermediate persists were
    // released as the loop advanced — only the live tail survives
    // (last checkpoint + rounds since it), not one block per round.
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 4,
      s"expected <=4 live cached RDDs, got ${after - before}")
  }

  test("settled-in-state BFS at depth 12: O(1) plan, checkpoints survive") {
    // The q187/q339 shape: TWO frames of state (frontier, settled),
    // where settled accumulates a union per round. Carried as a
    // closure var (the pre-round-7 form) the union chain's leaves are
    // per-round caches that GraphIter RELEASES at each checkpoint —
    // unrecomputable past round checkpointEvery. In-state, both frames
    // checkpoint and re-leaf together, so 12 rounds with a checkpoint
    // every 3 must terminate and match the checkpoint-free reference.
    // A 50-node RING (i ↔ i+1 mod 50): connected, diameter 25, so the
    // frontier is non-empty in every one of the 12 rounds — each round
    // does real anti-join + union work (graph()'s chord graph splits
    // into 4-cycles and would idle after round 2).
    val edges = spark.range(50)
      .selectExpr("id AS src", "(id + 1) % 50 AS dst")
      .union(spark.range(50)
        .selectExpr("(id + 1) % 50 AS src", "id AS dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    val seed = spark.range(1).selectExpr("CAST(0 AS BIGINT) AS id",
      "CAST(0 AS BIGINT) AS hop")
    def freshOf(frontier: DataFrame, settled: DataFrame,
        k: Int): DataFrame = edges
      .join(frontier.select(col("id").as("src")), "src")
      .select(col("dst").as("id")).distinct()
      .join(settled, Seq("id"), "left_anti")
      .withColumn("hop", lit(k.toLong))
    val before = spark.sparkContext.getPersistentRDDs.size
    val fin = GraphIter.run(Seq(seed, seed), rounds = 12,
        checkpointEvery = 3, GraphIter.Eager) {
      case (Seq(frontier, settled), k) =>
        val fresh = freshOf(frontier, settled, k)
        Seq(fresh, settled.union(fresh))
    }
    val got = fin(1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Reference: driver-side BFS over the collected 50-node edge set.
    // (A DataFrame reference without GraphIter is impossible at this
    // depth: settled is referenced twice per round, so the lazy-union
    // plan doubles each round — 2^12 subtrees, analyzer OOM — which is
    // the very failure mode this driver exists to prevent.)
    val adj = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val want = scala.collection.mutable.Map(0L -> 0L)
    var front = Set(0L)
    (1 to 12).foreach { k =>
      front = front.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(want.contains)
      front.foreach(want(_) = k.toLong)
    }
    assert(got == want.toSet)
    assert(got.size == 25) // hops 0..12 in both ring directions
    // Settled's plan hangs off the round-9 checkpoint leaf plus the
    // <=3 rounds since it (settled is referenced twice per round, so
    // that tail contributes up to 2^3 subtree copies): bounded by
    // checkpointEvery — CONSTANT in total depth — where the
    // uncheckpointed form would carry 2^12 copies (~thousands of
    // lines; measured 182 here vs analyzer OOM without GraphIter).
    val planLines = fin(1).queryExecution.analyzed.treeString
      .linesIterator.size
    assert(planLines < 400, s"plan unexpectedly deep: $planLines lines")
    // Live blocks: last checkpoint pair + rounds-since-it pairs, not
    // one pair per round (graph() leaves 2 persisted frames behind).
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 10,
      s"expected <=10 live cached RDDs, got ${after - before}")
    edges.unpersist()
  }

  test("Chain mode with checkpoints matches Chain without") {
    val init = spark.range(6).selectExpr("id", "CAST(1 AS BIGINT) AS v")
    def body(df: DataFrame, i: Int): DataFrame =
      df.select(col("id"), (col("v") + i).as("v"))
    val a = GraphIter.run(init, 9, 2, GraphIter.Chain)(body)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphIter.run(init, 9, 100, GraphIter.Chain)(body)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a == (0L until 6L).map(i => (i, 46L)).toSet) // 1 + Σ1..9
  }
}
