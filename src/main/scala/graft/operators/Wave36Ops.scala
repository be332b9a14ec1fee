package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 36: semantic-type inference and seeded graph relevance.
  *
  *   - q255 semantic-type profile: classify every profiled column's
  *     values against a pattern library (int / decimal / datetime /
  *     language code / JSON / tagged id / word text) — the inference
  *     pass a catalog runs over untyped inbound data before assigning
  *     schemas.
  *   - q256 personalized PageRank: random-walk-with-restart relevance
  *     from a seed set (one market segment's customers) over the
  *     customer–supplier bipartite graph — "which suppliers matter to
  *     THIS cohort", vs q119's global importance.
  */
object Wave36Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Evaluate once per multi-consumer base (same contract as
    * AnalyticsOps.materialized — see the rationale there). */
  private def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** (table, column) pairs profiled by q255. */
  private val ProfCols: Seq[(String, String)] = Seq(
    ("customer", "c_custkey"), ("customer", "c_name"),
    ("customer", "c_acctbal"), ("orders", "o_orderdate"),
    ("part", "p_name"), ("documents", "lang"), ("documents", "source"),
    ("events", "props"), ("events", "event_type"))

  /** Pattern library, first match wins. Anchored regexes behave
    * identically under Java regex (rlike) and RE2 (DuckDB
    * regexp_matches): both are search-semantics engines, and ^…$
    * anchoring makes search ≡ full match. Classification is robust to
    * engine-specific value RENDERING differences (e.g. double
    * formatting) because every pattern keys on shape, not exact text,
    * and only class counts reach the output. */
  private val TypePatterns: Seq[(String, String)] = Seq(
    ("int", "^-?[0-9]+$"),
    ("decimal", "^-?[0-9]+\\.[0-9]+$"),
    ("datetime", "^[0-9]{4}-[0-9]{2}-[0-9]{2}([ T].*)?$"),
    ("code2", "^[a-z]{2}$"),
    ("json", "^\\{.*\\}$"),
    ("id_tag", "^[A-Za-z]+#[0-9]+$"),
    ("word_text", "^[A-Za-z ]+$"))

  private def classify(v: Column): Column =
    when(v.isNull, lit("null")).otherwise(
      TypePatterns.foldRight(lit("other"): Column) {
        case ((name, re), acc) => when(v.rlike(re), lit(name)).otherwise(acc)
      })

  val queries: Map[String, Q] = Map(
    // ---- q255: semantic-type inference profile -------------------------
    // q222's stacked-scan shape: ONE scan per table explodes its
    // profiled columns map-side into (col_name, value) pairs, the
    // pattern CASE runs inside that same map stage (codegen'd rlike
    // chain, no UDF), and ONE grouped shuffle of (col_name, class)
    // pairs — already reduced to ≤ 8 rows per column by map-side
    // combine — yields the whole profile. The ppm share window runs
    // over the tiny class frame.
    "q255_semantic_types" -> ((s, d) => {
      val stacked = ProfCols.groupBy(_._1).toSeq.map { case (t, tc) =>
        table(s, d, t).select(explode(array(tc.map { case (_, c) =>
          struct(lit(s"$t.$c").as("col_name"),
            col(c).cast("string").as("v"))
        }: _*)).as("p"))
          .select(col("p.col_name").as("col_name"),
            classify(col("p.v")).as("cls"))
      }.reduce(_ unionByName _)
      val g = stacked.groupBy("col_name", "cls").agg(count(lit(1)).as("n"))
      g.withColumn("ppm",
        expr("n * 1000000 div " +
          "sum(n) OVER (PARTITION BY col_name)").cast("long"))
    }),

    // ---- q256: personalized PageRank from a seed cohort -----------------
    // Same bipartite graph, loop shape, and integer arithmetic as
    // q119 (edges+degrees materialized once, shuffle_hash-hinted rank
    // side — NO compulsory broadcast: the reached set approaches |V|
    // by round 3, and a forced broadcast of a node-sized frame would
    // bypass AQE's size check and hit the driver wall at scale;
    // edges are already keyed on src so the hash build stays
    // per-partition-bounded) — but teleport mass restarts ONLY
    // at the BUILDING-segment customers, so rank measures proximity
    // to that cohort. The rank frame stays SPARSE: it carries only
    // reached nodes (seeds ∪ inflow), so early iterations move a
    // seed-sized frame, not the node set. Mass in micro-micro units
    // (1e12 total) keeps three rounds of integer division exact
    // enough that ranks stay well separated; seeds.count() is a
    // 1-row driver scalar (documented, bounded). The full-outer with
    // the seed list implements "+ 0.15·e_s" sparsely.
    "q256_personalized_pagerank" -> ((s, d) => {
      val eo = table(s, d, "lineitem")
        .join(table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // half-size eo is the cached frame; the symmetrized edge list is
      // a map-only projection of it per consumer (caching post-explode
      // re-plans the join+distinct subtree once per explode branch
      // inside the InMemoryRelation — the round-7 q194 plan audit
      // caught lineitem⋈orders running twice; same fix here)
      val eoM = materialized(eo)
      val edges0 = eoM
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val deg = materialized(
        edges0.groupBy("src").agg(count(lit(1)).as("deg")))
      val seeds = materialized(table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select((col("c_custkey") * 2).as("id")))
      val nSeeds = seeds.count()
      val t = 1000000000000L / nSeeds
      val bonus = t * 15 / 100
      val rank0 = seeds.select(col("id"), lit(t).as("r"))
      val rank = GraphIter.run(rank0, 3, 8, GraphIter.Lazy) { (rank, _) =>
        val divided = rank.join(deg, rank("id") === deg("src"))
          .select(col("src"), expr("r div deg").as("share"))
        val inflow = edges0.join(divided.hint("shuffle_hash"), "src")
          .groupBy("dst").agg(sum("share").as("m"))
          .select(col("dst").as("id"), col("m"))
        inflow
          .join(seeds.withColumn("is_seed", lit(1L)), Seq("id"), "full_outer")
          .select(col("id"),
            (expr("coalesce(m, 0L) * 85 div 100") +
              when(col("is_seed").isNotNull, lit(bonus))
                .otherwise(lit(0L))).as("r"))
      }
      rank.filter(col("r") > 0)
        .orderBy(col("r").desc, col("id").asc).limit(20)
        .select(concat(
          when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")),
          expr("id div 2")).as("id"), col("r"))
    }))

  private val profStackSql = ProfCols.map { case (t, c) =>
    s"SELECT '$t.$c' AS col_name, CAST($c AS VARCHAR) AS v FROM $t"
  }.mkString("\n UNION ALL ")

  private val typeCaseSql =
    "CASE WHEN v IS NULL THEN 'null' " +
      TypePatterns.map { case (name, re) =>
        s"WHEN regexp_matches(v, '$re') THEN '$name' "
      }.mkString +
      "ELSE 'other' END"

  /** One PPR iteration as SQL CTEs (rank table rIn → rOut). */
  private def pprStepSql(k: Int): String = {
    val (rIn, c, i, rOut) = (s"r${k - 1}", s"c$k", s"i$k", s"r$k")
    s"""$c AS (SELECT e.dst, r.r // d.deg AS share FROM edges e
           JOIN $rIn r ON r.id = e.src JOIN deg d ON d.src = e.src),
       $i AS (SELECT dst AS id, CAST(sum(share) AS BIGINT) AS m
              FROM $c GROUP BY dst),
       $rOut AS (SELECT COALESCE(i.id, s.id) AS id,
           CAST(COALESCE(i.m, 0) * 85 // 100 +
             CASE WHEN s.id IS NOT NULL
               THEN (1000000000000 // ns.n) * 15 // 100 ELSE 0 END
             AS BIGINT) AS r
         FROM $i i FULL OUTER JOIN seeds s ON i.id = s.id CROSS JOIN ns)"""
  }

  val oracle: Map[String, String] = Map(
    "q255_semantic_types" ->
      s"""WITH stacked AS (
           $profStackSql),
         classified AS (
           SELECT col_name, $typeCaseSql AS cls FROM stacked),
         g AS (
           SELECT col_name, cls, count(*) AS n
           FROM classified GROUP BY 1, 2)
         SELECT col_name, cls, n,
           CAST(n * 1000000 // sum(n) OVER (PARTITION BY col_name)
             AS BIGINT) AS ppm
         FROM g""",

    "q256_personalized_pagerank" ->
      s"""WITH eo AS (
           SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM eo
                   UNION ALL SELECT dst, src FROM eo),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         seeds AS (SELECT c_custkey * 2 AS id FROM customer
                   WHERE c_mktsegment = 'BUILDING'),
         ns AS (SELECT count(*) AS n FROM seeds),
         r0 AS (SELECT id, CAST(1000000000000 // n AS BIGINT) AS r
                FROM seeds CROSS JOIN ns),
         ${pprStepSql(1)},
         ${pprStepSql(2)},
         ${pprStepSql(3)}
         SELECT CASE WHEN id % 2 = 0 THEN 'c' || CAST(id // 2 AS BIGINT)
                     ELSE 's' || CAST(id // 2 AS BIGINT) END AS id, r
         FROM (SELECT id, r FROM r3 WHERE r > 0
               ORDER BY r DESC, id ASC LIMIT 20)""")
}
