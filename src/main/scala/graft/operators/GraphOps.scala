package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

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

  /** Both edge directions plus a self-loop per node; persisted ALREADY
    * HASH-PARTITIONED on the join key, so the per-round join reuses the
    * cached layout instead of re-exchanging the edge list every
    * iteration — edges ≫ nodes, so that exchange is the loop's
    * dominant shuffle at scale. (The comp side still shuffles each
    * round: it is node-sized, the cheap side.)
    */
  private def adjSelf(
      edges: DataFrame, resize: Boolean): (DataFrame, Long, Int) = {
    val adj = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(edges.select(col("b_id").as("src"),
        col("a_id").as("dst")))
    val wide = adj.unionByName(
        adj.select(col("src")).distinct().withColumn("dst", col("src")))
      .repartition(col("src"))
      .persist()
    // resize = false (r12): the FIXED-round variant chains all rounds
    // into ONE caller action — the resize below spent two extra driver
    // actions (count + re-persist count, ~1.0 s of q139's 2.5 s wall
    // in JobProbe: two 1-task jobs plus their planning gaps) to shave
    // near-empty tasks off stages that all live inside that single
    // job. The convergence loop is the opposite trade: it re-scans the
    // cache once per probed round as its own job, so the small-graph
    // task floor dominates there and the resize stays (it also needs
    // `rows` for the AQE regime decision anyway). Resize=false returns
    // the lazily-persisted frame (populated by the caller's terminal
    // action — the r10 shape) and skips both counts.
    if (!resize) return (wide, -1L, -1)
    // Scale-adaptive cache layout (r11, guide §2): the cached adjacency
    // sets EVERY round's task count — a graph loop re-scans it once per
    // hash-min round, and AQE cannot coalesce a cached layout the way
    // it coalesces a fresh exchange. At the session default (32) a
    // few-thousand-edge blocking graph (q217's ER pairs, LSH-pair
    // families) paid ~32 near-empty tasks per job, ~8 jobs per probed
    // iteration — the measured q217 wall was 75 jobs / 4.2 s of
    // scheduling gaps with every job under 0.3 s. Re-layout the cache
    // to ceil(rows / 200k) partitions, capped at the session shuffle
    // parallelism, so small graphs loop on 1-2 tasks while a 100 TB
    // edge list keeps today's full fan-out (the cap is the conf a
    // cluster sizes to executors × cores). The count doubles as the
    // eager materialization the loop wants anyway; one extra exchange
    // replaces a 32× per-round task floor.
    val rows = wide.count()
    val cap = math.max(1,
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val want = math.max(1L, math.min(cap.toLong, rows / 200000L + 1L)).toInt
    val sized =
      if (want < cap) {
        val s = wide.repartition(want, col("src")).persist()
        s.count()
        wide.unpersist()
        s
      } else wide
    (sized, rows, want)
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
    val (adj, _, _) = adjSelf(edges, resize = false)
    (1 to rounds).foldLeft(nodesOf(adj))((c, _) => step(c, adj))
  }

  /** To-convergence hash-min with one tiny driver action per round (the
    * fixpoint check: the sum of component ids strictly decreases until
    * converged). Persists per round so iteration i+1 reads a
    * materialized frame, not an ever-deepening lineage. */
  def connectedComponents(
      edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // coalesce(0): an EMPTY edge set (a corpus with no duplicate pairs
    // this run — legitimate at small scale) must yield an empty result,
    // not a null-sum crash in the convergence probe.
    def probe(df: DataFrame): Long =
      df.agg(coalesce(sum("comp"), lit(0L))).head().getLong(0)
    // Pointer jumping (path halving): after each hash-min round,
    // comp(n) ← comp(comp(n)). Hash-min alone moves the component
    // minimum ONE hop per round — O(diameter) rounds, and a chain-y
    // graph (e.g. edit-distance-1 name chains in q217) pays tens of
    // driver-probed iterations. The jump composes the current labeling
    // with itself, halving every chain, so convergence is O(log
    // diameter). comp values are always node ids of the same component
    // (min over a neighborhood closure), so the self-join resolves;
    // left_outer+coalesce keeps the row if a label has no own entry.
    def jump(c: DataFrame): DataFrame =
      c.join(c.select(col("id").as("cid"), col("comp").as("ccomp")),
          col("comp") === col("cid"), "left_outer")
        .select(col("id"),
          coalesce(col("ccomp"), col("comp")).as("comp"))
    // localCheckpoint (eager), not persist: `jump` references the
    // round's frame TWICE, so with plain persist the logical plan
    // doubles every round — exponential analyzer/optimizer blowup that
    // OOMs the driver near round ~30 even on tiny data (persist caches
    // rows, not lineage). Checkpointing truncates the plan to a leaf,
    // keeping per-round planning O(1). Executor-local storage is the
    // right trade for a convergence loop (re-derivable on loss); a
    // 1000-executor deployment with long jobs would point
    // spark.checkpoint.dir at reliable storage and use checkpoint().
    val (adj, adjRows, adjParts) = adjSelf(edges, resize = true)
    // Small-graph regime (r11, guide §1.2 step 1: fewer driver round
    // trips): every probed iteration's checkpoint action is split by
    // AQE into one stage-job per exchange (~8 near-empty jobs per
    // iteration measured on q217 AFTER the adjacency was sized — 77
    // jobs, 3.9 s of scheduling gaps, every job < 0.05 s). When the
    // measured adjacency is small, run the loop's INTERNAL actions
    // with AQE off and the shuffle parallelism pinned to the sized
    // cache layout: same physical work, one job per action instead of
    // one per exchange. A big graph (≥ cap partitions) keeps AQE —
    // there coalescing/skew handling earn their stage-jobs.
    //
    // Conf scoping (r12): the regime lives on a `newSession()` CHILD
    // (same SparkContext, shared cache — the persisted adjacency still
    // hits — private SQL conf), with the loop's frames re-bound to it
    // via PlanApi.rebind. The caller's session conf is never touched,
    // so a concurrent query on the same session cannot observe the
    // AQE/partitions override (the set/restore-in-`finally` this
    // replaces was single-thread-safe only). The returned frame is
    // re-bound to the caller's session; it is already materialized
    // (eager checkpoint — a LogicalRDD leaf), so nothing downstream
    // re-enters the child. Results are layout-independent either way.
    val spark = edges.sparkSession
    val smallGraph = adjRows < 5000000L
    val loop =
      if (smallGraph) {
        val c = spark.newSession()
        c.conf.set("spark.sql.adaptive.enabled", "false")
        c.conf.set("spark.sql.shuffle.partitions", adjParts.toString)
        c
      } else spark
    val adjL =
      if (smallGraph)
        org.apache.spark.sql.graft.PlanApi.rebind(adj, loop)
      else adj
    var comp = nodesOf(adjL).localCheckpoint(true)
    var prevSum = probe(comp)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // TWO (hash-min + path-halving) rounds per driver iteration
      // (r11): each iteration pays a fixed floor of one checkpoint
      // job + one probe job regardless of how much halving work it
      // carries, and on the floor-bound corpus sizes that fixed cost
      // IS the loop (q217 ran 81 jobs). Doubling the rounds between
      // probes halves the driver round-trips; the fixpoint test is
      // unchanged (per-node comp is monotone non-increasing, so an
      // unchanged sum still means BOTH sub-rounds were no-ops), at
      // the price of at most one redundant sub-round after
      // convergence. Monotonicity also keeps the result identical:
      // the fixpoint of hash-min CC is the per-component minimum
      // whatever the round grouping.
      val s1 = step(comp, adjL).persist()
      val s2 = step(jump(s1), adjL).persist()
      val next = jump(s2).localCheckpoint(true)
      val s = probe(next)
      s1.unpersist(); s2.unpersist()
      // `next` is materialized (eager checkpoint), so the superseded
      // round's checkpoint blocks have no future reader — release them
      // now rather than waiting for the ContextCleaner to GC the
      // frame: a long session invoking CC repeatedly (q87, q98, q217,
      // the convergence probes) otherwise accumulates dead
      // MEMORY_AND_DISK blocks across rounds and calls.
      org.apache.spark.sql.graft.PlanApi.releaseLocalCheckpoint(comp)
      comp = next
      converged = s == prevSum
      prevSum = s
      rounds += 1
    }
    adj.unpersist()
    if (smallGraph) org.apache.spark.sql.graft.PlanApi.rebind(comp, spark)
    else comp
  }

  val queries: Map[String, Q] = Map(
    // ---- near-dup clusters: LSH candidate pairs → components ----------
    // component id = min doc_id in the duplicate family (the canonical
    // survivor a dedup pass would keep). 6 fixed rounds ≥ the LSH-graph
    // diameter (2 bands ⇒ ≤ 2 buckets per doc); kept plan-pure so the
    // oracle can replay it.
    "q87_neardup_clusters" -> ((s, d) =>
      connectedComponentsFixed(TextOps.lshPairs(s, d), rounds = 6)
        .select(col("id").as("doc_id"), col("comp").as("component"))),

    // ---- dedup APPLY: clusters → keep-list -----------------------------
    // The step a curation pipeline actually ships: every document maps
    // to its duplicate family (docs outside any LSH pair are their own
    // singleton family), the canonical survivor is the min doc_id, and
    // the output is one row per SURVIVOR with how much the dedup pass
    // dropped. Corpus-side work is one left join against the (tiny)
    // component map + one groupBy — no per-family driver logic, so the
    // keep-list materializes at corpus scale.
    "q98_dedup_apply" -> ((s, d) => {
      val comp = connectedComponentsFixed(TextOps.lshPairs(s, d), rounds = 6)
        .withColumnRenamed("id", "doc_id")
      table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .join(comp, Seq("doc_id"), "left_outer")
        .withColumn("component", coalesce(col("comp"), col("doc_id")))
        .groupBy("component")
        .agg(count(lit(1)).as("family_size"),
          max(when(col("doc_id") === col("component"), col("n_chars")))
            .cast("long").as("n_chars_kept"),
          sum(when(col("doc_id") =!= col("component"), col("n_chars"))
            .otherwise(0)).cast("long").as("n_chars_dropped"))
        .select(col("component").as("doc_id"), col("family_size"),
          col("n_chars_kept"), col("n_chars_dropped"))
    }),

    // ---- q146: missed-duplicate candidates (link prediction) -----------
    // Common-neighbor link prediction over the LSH candidate graph:
    // pairs that are NOT LSH candidates but share ≥1 neighbor are
    // likely duplicates the banding missed (two near-identical docs
    // can land in disjoint buckets while both colliding with a third).
    // The wedge join runs on the tiny candidate graph (never the
    // corpus) and is bounded by Σ deg² over bucket-capped degrees.
    // Every wedge pair is reported with its common-neighbor support
    // and whether LSH already pairs it — the `already_paired = false`
    // rows are the recall gap; feeding them through an exact verify
    // (q38-style) closes it without lowering the LSH threshold
    // corpus-wide.
    "q146_missed_neighbors" -> ((s, d) => {
      val e = TextOps.lshPairs(s, d).persist() // tiny; reused 2×
      val adj = e.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(
          e.select(col("b_id").as("src"), col("a_id").as("dst")))
      val cand = adj.select(col("src").as("mid"), col("dst").as("a_id"))
        .join(adj.select(col("src").as("mid"), col("dst").as("b_id")),
          "mid")
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("common_neighbors"))
      cand.join(e.withColumn("already_paired", lit(true)),
          Seq("a_id", "b_id"), "left_outer")
        .withColumn("already_paired",
          coalesce(col("already_paired"), lit(false)))
    }),

    // ---- q139: canonical selection by quality --------------------------
    // The realistic dedup keep-policy: within each duplicate family,
    // keep the HIGHEST-QUALITY document (type-token ratio, doc_id
    // tie-break), not the arbitrary min-id that q98 demonstrates.
    // Corpus-side work is one scoring pass + one left join against the
    // (tiny) component map + one per-family rank; the window partitions
    // by family, whose size is bounded by the LSH bucket cap.
    "q139_canonical_pick" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val comp = connectedComponentsFixed(TextOps.lshPairs(s, d), rounds = 6)
        .withColumnRenamed("id", "doc_id")
      val scored = table(s, d, "documents")
        .withColumn("t",
          filter(split(lower(col("text")), " "), w => w =!= ""))
        .filter(size(col("t")) > 0)
        .select(col("doc_id"),
          expr("""(cast(size(array_distinct(t)) as bigint) * 1000000)
                  div size(t)""").as("ttr_ppm"))
      // Split the corpus at the component membership boundary: only
      // docs inside a dup component need the per-family rank window
      // (candidate-bounded work); every other doc is its own family
      // with rn=1/n_docs=1 by definition — a map-only filter with NO
      // window, so the corpus never shuffles on `family`. One corpus
      // pass: the scored+membership frame (3 narrow columns, text
      // dropped) is persisted once for its two consumers; comp is the
      // near-dup population (small vs corpus) — AQE broadcasts it.
      val fam = scored.join(comp, Seq("doc_id"), "left_outer")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = Window.partitionBy("family")
        .orderBy(col("ttr_ppm").desc, col("doc_id"))
      val dupPicks = fam.filter(col("comp").isNotNull)
        .withColumn("family", col("comp"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_docs",
          count(lit(1)).over(Window.partitionBy("family")))
        .filter(col("rn") === 1)
        .select(col("family").as("family_id"), col("doc_id").as("keep_doc"),
          col("ttr_ppm").as("keep_ttr"), col("n_docs"))
      val singles = fam.filter(col("comp").isNull)
        .select(col("doc_id").as("family_id"), col("doc_id").as("keep_doc"),
          col("ttr_ppm").as("keep_ttr"), lit(1L).as("n_docs"))
      dupPicks.unionByName(singles)
    }),

    // ---- q136: near-dup graph quality audit ----------------------------
    // Degree + triangle count + clustering coefficient per node of the
    // LSH candidate graph. A healthy near-dup graph is clique-like
    // (duplicate families are mutual), so LOW clustering coefficients
    // flag suspect edges — hash-collision bridges between unrelated
    // docs — before the dedup pass erases documents. Triangles are
    // enumerated once each on the oriented (a < b) edge list with the
    // standard two-join; all stages key on doc ids, and the edge list
    // is candidate pairs (bounded by the LSH bucket cap), never the
    // corpus, so the whole audit is a tiny sidecar job at any scale.
    "q136_dup_graph_stats" -> ((s, d) => {
      val e = TextOps.lshPairs(s, d).persist() // tiny; reused 3×
      val deg = e.select(explode(array(col("a_id"), col("b_id")))
          .as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      val tri = e
        .join(e.select(col("a_id").as("b_id"), col("b_id").as("c_id")),
          "b_id")
        .join(e.select(col("a_id"), col("b_id").as("c_id")),
          Seq("a_id", "c_id"))
        .select(explode(array(col("a_id"), col("b_id"), col("c_id")))
          .as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
      deg.join(tri, Seq("doc_id"), "left_outer")
        .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
        .withColumn("cc_ppm", expr(
          """case when degree >= 2
             then (2000000 * n_tri) div (degree * (degree - 1))
             else cast(0 as bigint) end"""))
        .select("doc_id", "degree", "n_tri", "cc_ppm")
    }))

  // Same LSH pair derivation as q37 (shared by the component and
  // triangle oracles below).
  private val pairsCte =
    """sigs AS (
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
             FROM sigs l JOIN sigs r ON l.b1 = r.b1 AND l.doc_id < r.doc_id))"""

  // Transitive closure over the pair graph via a recursive CTE:
  // component(id) = min id reachable from id.
  private val reachCte =
    s"""WITH RECURSIVE $pairsCte,
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION ALL SELECT b_id, a_id FROM pairs),
         reach(id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)"""

  val oracle: Map[String, String] = Map(
    "q87_neardup_clusters" ->
      s"""$reachCte
         SELECT id AS doc_id, min(r) AS component
         FROM reach GROUP BY id""",

    "q98_dedup_apply" ->
      s"""$reachCte,
         comp AS (SELECT id AS doc_id, min(r) AS component
                  FROM reach GROUP BY id)
         SELECT coalesce(c.component, d.doc_id) AS doc_id,
                count(*) AS family_size,
                CAST(max(CASE WHEN d.doc_id = coalesce(c.component, d.doc_id)
                              THEN d.n_chars END) AS BIGINT) AS n_chars_kept,
                CAST(sum(CASE WHEN d.doc_id <> coalesce(c.component, d.doc_id)
                              THEN d.n_chars ELSE 0 END) AS BIGINT)
                  AS n_chars_dropped
         FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
         GROUP BY coalesce(c.component, d.doc_id)""",

    "q146_missed_neighbors" ->
      s"""WITH $pairsCte,
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION ALL SELECT b_id, a_id FROM pairs),
         cand AS (
           SELECT x.dst AS a_id, y.dst AS b_id,
             count(*) AS common_neighbors
           FROM edges x JOIN edges y ON x.src = y.src AND x.dst < y.dst
           GROUP BY 1, 2)
         SELECT c.a_id, c.b_id, c.common_neighbors,
           EXISTS (SELECT 1 FROM pairs p
                   WHERE p.a_id = c.a_id AND p.b_id = c.b_id)
             AS already_paired
         FROM cand c""",

    "q139_canonical_pick" ->
      s"""$reachCte,
         comp AS (SELECT id AS doc_id, min(r) AS component
                  FROM reach GROUP BY id),
         scored AS (
           SELECT doc_id,
             (CAST(len(list_distinct(t)) AS BIGINT) * 1000000) // len(t)
               AS ttr_ppm
           FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), w -> w <> '')
                     AS t
                 FROM documents)
           WHERE len(t) > 0),
         fam AS (
           SELECT s.doc_id, s.ttr_ppm,
             coalesce(c.component, s.doc_id) AS family
           FROM scored s LEFT JOIN comp c ON s.doc_id = c.doc_id),
         ranked AS (
           SELECT fam.*,
             row_number() OVER (
               PARTITION BY family ORDER BY ttr_ppm DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY family) AS n_docs
           FROM fam)
         SELECT family AS family_id, doc_id AS keep_doc,
                ttr_ppm AS keep_ttr, n_docs
         FROM ranked WHERE rn = 1""",

    "q136_dup_graph_stats" ->
      s"""WITH $pairsCte,
         tri AS (
           SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
           FROM pairs e1
           JOIN pairs e2 ON e1.b_id = e2.a_id
           JOIN pairs e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id),
         tn AS (SELECT node, count(*) AS n_tri
                FROM (SELECT unnest([a, b, c]) AS node FROM tri)
                GROUP BY 1),
         dg AS (SELECT node, count(*) AS degree
                FROM (SELECT a_id AS node FROM pairs
                      UNION ALL SELECT b_id FROM pairs)
                GROUP BY 1)
         SELECT dg.node AS doc_id, dg.degree,
           CAST(coalesce(tn.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(CASE WHEN dg.degree >= 2
                THEN (2000000 * coalesce(tn.n_tri, 0))
                     // (dg.degree * (dg.degree - 1))
                ELSE 0 END AS BIGINT) AS cc_ppm
         FROM dg LEFT JOIN tn ON dg.node = tn.node""")
}
