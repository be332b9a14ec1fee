package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped operators for training-data curation — here: near-dup
  * CLUSTERING. LSH (q37) emits candidate PAIRS; a dedup pipeline needs
  * components ("this group of documents is one duplicate family, keep
  * the canonical one"). Connected components via hash-min label
  * propagation — each round every node takes the min component id among
  * itself and its neighbors; rounds needed = graph diameter, and each
  * round is one join + one aggregation (all shuffle-partitioned by
  * node, no driver-side graph).
  */
object GraphOps {

  type Q = (SparkSession, String) => DataFrame

  /** One hash-min round over a SELF-LOOPED adjacency:
    * comp'(n) = min over {comp(m) : m ∈ N(n) ∪ {n}}. The self-loops
    * mean `comp` is referenced exactly ONCE per round — the iterated
    * logical plan grows linearly, where the textbook
    * "join-then-outer-join-back" step references it twice and doubles
    * the tree every round (2^rounds copies of the upstream pipeline).
    */
  private def step(comp: DataFrame, adjSelf: DataFrame): DataFrame =
    adjSelf
      .join(comp.withColumnRenamed("id", "src"), "src")
      .groupBy("dst").agg(min("comp").as("comp"))
      .withColumnRenamed("dst", "id")

  /** Both edge directions plus a self-loop per node; persisted — it is
    * tiny (candidate pairs, not the corpus) and every round reuses it.
    */
  private def adjSelf(edges: DataFrame): DataFrame = {
    val adj = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(edges.select(col("b_id").as("src"),
        col("a_id").as("dst")))
    adj.unionByName(
        adj.select(col("src")).distinct().withColumn("dst", col("src")))
      .persist()
  }

  private def nodesOf(adj: DataFrame): DataFrame =
    adj.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))

  /** Fixed-round hash-min: a pure chained plan (no driver actions),
    * exact when `rounds` ≥ graph diameter. LSH-pair graphs are unions
    * of per-bucket cliques bridged by multi-bucket docs — diameter
    * stays tiny (each doc sits in ≤ #bands buckets), so a small
    * constant suffices; `connectedComponents` below is the
    * to-convergence variant for arbitrary graphs. */
  def connectedComponentsFixed(
      edges: DataFrame, rounds: Int): DataFrame = {
    val adj = adjSelf(edges)
    (1 to rounds).foldLeft(nodesOf(adj))((c, _) => step(c, adj))
  }

  /** To-convergence hash-min with one tiny driver action per round (the
    * fixpoint check: the sum of component ids strictly decreases until
    * converged). Persists per round so iteration i+1 reads a
    * materialized frame, not an ever-deepening lineage. */
  def connectedComponents(
      edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val adj = adjSelf(edges)
    var comp = nodesOf(adj).persist()
    var prevSum = comp.agg(sum("comp")).head().getLong(0)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = step(comp, adj).persist()
      val s = next.agg(sum("comp")).head().getLong(0)
      comp.unpersist()
      comp = next
      converged = s == prevSum
      prevSum = s
      rounds += 1
    }
    adj.unpersist()
    comp
  }

  val queries: Map[String, Q] = Map(
    // ---- near-dup clusters: LSH candidate pairs → components ----------
    // component id = min doc_id in the duplicate family (the canonical
    // survivor a dedup pass would keep). 6 fixed rounds ≥ the LSH-graph
    // diameter (2 bands ⇒ ≤ 2 buckets per doc); kept plan-pure so the
    // oracle can replay it.
    "q87_neardup_clusters" -> ((s, d) =>
      connectedComponentsFixed(TextOps.lshPairs(s, d), rounds = 6)
        .select(col("id").as("doc_id"), col("comp").as("component"))))

  val oracle: Map[String, String] = Map(
    "q87_neardup_clusters" ->
      // Same LSH pair derivation as q37, then transitive closure via a
      // recursive CTE: component(id) = min id reachable from id.
      """WITH RECURSIVE sigs AS (
           SELECT doc_id,
             md5(min(substr(md5(shingle), 1, 8))
                 || min(substr(md5(shingle), 9, 8))) AS b0,
             md5(min(substr(md5(shingle), 17, 8))
                 || min(substr(md5(shingle), 25, 8))) AS b1
           FROM (
             SELECT doc_id, unnest(list_transform(range(0, len(tokens) - 2),
               i -> array_to_string(list_slice(tokens, i + 1, i + 3), ' '))) AS shingle
             FROM (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), w -> w <> '') AS tokens
                   FROM documents)
             WHERE len(tokens) >= 3)
           GROUP BY doc_id),
         pairs AS (
           SELECT DISTINCT a_id, b_id FROM (
             SELECT l.doc_id AS a_id, r.doc_id AS b_id
             FROM sigs l JOIN sigs r ON l.b0 = r.b0 AND l.doc_id < r.doc_id
             UNION ALL
             SELECT l.doc_id AS a_id, r.doc_id AS b_id
             FROM sigs l JOIN sigs r ON l.b1 = r.b1 AND l.doc_id < r.doc_id)),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION ALL SELECT b_id, a_id FROM pairs),
         reach(id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
         SELECT id AS doc_id, min(r) AS component
         FROM reach GROUP BY id""")
}
