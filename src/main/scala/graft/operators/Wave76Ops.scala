package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 76: seeded harmonic centrality — the "how reachable is
  * everyone from our anchor accounts" readout. Multi-source BFS over
  * the customer–supplier interaction graph (q187's bipartite edges)
  * carrying SEED IDENTITY through the frontier, so each (seed, node)
  * pair settles at its exact minimum hop; harmonic score
  * Σ_seeds 1e6 div hop rewards being close to MANY seeds. Bounded
  * rounds via the shared GraphIter driver (periodic localCheckpoint,
  * superseded-block release).
  */
object Wave76Ops {

  type Q = (SparkSession, String) => DataFrame

  private def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  val queries: Map[String, Q] = Map(
    // ---- q339: harmonic centrality from the anchor seeds ---------------
    // Frontier state is (seed, id): the per-seed BFS runs fan out in
    // ONE set of joins (shuffle on src, the scalable direction — the
    // frontier is never broadcast); per-seed settled sets anti-join
    // exactly as q187 does for one source. 3 hops from the 5 anchor
    // customers; harmonic_micro = Σ 1e6 div hop over reached seeds;
    // top-20 nodes by (score desc, id) via TakeOrdered. Work is
    // O(|E|·rounds·|seeds-reached-overlap|) with every frame keyed —
    // the multi-source trick that costs one BFS, not |seeds|.
    "q339_harmonic_centrality" -> ((s, d) => {
      val eo = table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // half-size eo is the cached frame; the symmetrized edge list is
      // a map-only projection of it per consumer (caching post-explode
      // re-plans the join+distinct subtree once per explode branch
      // inside the InMemoryRelation — the round-7 q194 plan audit
      // caught lineitem⋈orders running twice; same fix here)
      val eoM = materialized(eo)
      val edges = eoM
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val seed = materialized(edges
        .filter(col("src") % 2 === 0 && col("src") < 10)
        .select(col("src").as("seed"), col("src").as("id")).distinct()
        .withColumn("hop", lit(0L)))
      // settled rides GraphIter state (second frame) so the union is
      // checkpointed and re-leafed with the frontier — a closure var
      // would reference released localCheckpoint blocks past
      // checkpointEvery rounds (see the q187 comment; GraphIterSpec
      // runs this exact harmonic body 12 rounds deep with O(1) plans).
      val fin = GraphIter.run(Seq(seed, seed), 3, 8, GraphIter.EagerHead) {
        case (Seq(frontier, settled), k) =>
          val fresh = edges
            .join(frontier.select(col("seed"), col("id").as("src")), "src")
            .select(col("seed"), col("dst").as("id")).distinct()
            .join(settled, Seq("seed", "id"), "left_anti")
            .withColumn("hop", lit(k.toLong))
          Seq(fresh, settled.union(fresh))
      }
      fin(1).filter(col("hop") > 0)
        .groupBy("id")
        .agg(count(lit(1)).as("n_seeds"),
          sum(expr("1000000 div hop")).as("harmonic_micro"))
        .orderBy(col("harmonic_micro").desc, col("id"))
        .limit(20)
    }))

  val oracle: Map[String, String] = Map(
    // Per-seed unrolled min-hop closure (the q187 oracle shape with
    // seed identity carried through every level).
    "q339_harmonic_centrality" ->
      """WITH eo AS (
           SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM eo
                   UNION ALL SELECT dst, src FROM eo),
         d0 AS (SELECT DISTINCT src AS seed, src AS id FROM edges
                WHERE src % 2 = 0 AND src < 10),
         n1 AS (
           SELECT DISTINCT f.seed, e.dst AS id
           FROM d0 f JOIN edges e ON e.src = f.id
           WHERE e.dst <> f.seed),
         n2 AS (
           SELECT DISTINCT f.seed, e.dst AS id
           FROM n1 f JOIN edges e ON e.src = f.id
           LEFT JOIN n1 x ON x.seed = f.seed AND x.id = e.dst
           WHERE x.id IS NULL AND e.dst <> f.seed),
         n3 AS (
           SELECT DISTINCT f.seed, e.dst AS id
           FROM n2 f JOIN edges e ON e.src = f.id
           LEFT JOIN n1 x1 ON x1.seed = f.seed AND x1.id = e.dst
           LEFT JOIN n2 x2 ON x2.seed = f.seed AND x2.id = e.dst
           WHERE x1.id IS NULL AND x2.id IS NULL AND e.dst <> f.seed),
         reached AS (
           SELECT seed, id, 1 AS hop FROM n1
           UNION ALL SELECT seed, id, 2 FROM n2
           UNION ALL SELECT seed, id, 3 FROM n3)
         SELECT id, CAST(count(*) AS BIGINT) AS n_seeds,
           CAST(sum(1000000 // hop) AS BIGINT) AS harmonic_micro
         FROM reached
         GROUP BY id
         ORDER BY harmonic_micro DESC, id
         LIMIT 20""")
}
