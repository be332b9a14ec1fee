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

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .appName("graphiter-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

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
