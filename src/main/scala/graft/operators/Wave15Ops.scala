package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 15: curation-pipeline operators a training-data platform
  * layers on top of the dedup/quality family, plus the forward direction
  * of the native as-of operator:
  *
  *   - q196 segment-level exact dedup with recompose: the Dolma/CCNet
  *     "paragraph dedup" shape — corpus-wide keep-first over fixed
  *     20-token segments, then per-document survival accounting. One
  *     window shuffle keyed on the segment; everything else is map-side.
  *   - q197 source-balanced quality gate: per-SOURCE percentile
  *     normalization of a quality score, so one source's score scale
  *     can't crowd out the others when a global threshold is applied
  *     (the mixture-balancing complement of q102/q103 sampling).
  *   - q198 per-document contamination fraction: share of a document's
  *     distinct 5-grams that appear in the benchmark split — the
  *     GPT-3-appendix document-level flagging that complements q89's
  *     corpus-level hit counts and q97's Bloom screen.
  *   - q199 k-core peel: bounded rounds of degree-threshold peeling on
  *     the customer–supplier trade graph — the graph-curation primitive
  *     for trimming weakly-connected spam clusters before link analysis.
  *   - q200 split-leakage audit: near-dup candidate pairs (q37's banded
  *     MinHash) that straddle train/valid/test splits — the eval-
  *     integrity check every dataset release runs.
  *   - q201 forward as-of join: time-to-next-conversion per click via
  *     the native [[graft.plans.AsOf]] operator's `direction="forward"`
  *     (algebraic reduction to the backward sorted-merge exec).
  *
  * Reference context: the reference's own curation surface is dedup +
  * report queries (SURVEY §2.2, §2.5); these six extend that posture to
  * the split/contamination hygiene a 100 TB training corpus needs.
  */
object Wave15Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Fixed segment length (tokens) for q196. */
  private val SegLen = 20

  /** Whitespace tokens, empties dropped — the corpus-wide convention
    * shared with TextOps/Wave13Ops so oracles line up. */
  private def words(c: Column): Column =
    filter(split(lower(c), " "), w => length(w) > 0)

  /** Eagerly persist a multi-consumer / per-round subtree (same
    * discipline as AnalyticsOps/Wave13Ops). */
  private def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** md5-bucketed train/valid/test assignment (8/1/1) — deterministic,
    * engine-portable, and independent of row order, so the split is
    * STABLE under corpus growth (a doc never migrates between splits
    * when new data arrives — the property hash splits are chosen for). */
  private def splitOf(docId: Column): Column = {
    val b = conv(substring(md5(docId.cast("string")), 1, 4), 16, 10)
      .cast("long") % 10
    when(b < 8, "train").when(b === 8, "valid").otherwise("test")
  }

  val queries: Map[String, Q] = Map(
    // ---- q196: segment-level exact dedup with recompose ----------------
    // Segments = consecutive 20-token windows (deterministic segmentation
    // of the single-line corpus; on real prose the splitter is the
    // paragraph boundary and nothing else changes). Corpus-wide
    // keep-first: ONE window shuffle keyed on the segment text, first
    // occurrence in (doc_id, seg_idx) order survives. Per doc the output
    // is survival accounting (n_segs/n_kept/kept_chars) — the recompose
    // itself is array_join of the kept segments in seg_idx order, which
    // the gate's aggregate totals pin without hashing megabytes of text.
    // At 100 TB the window key is xxhash64(seg) (64-bit, shuffles 8
    // bytes instead of the segment text); the string key is kept here so
    // the result is bit-identical to the SQL oracle even under hash
    // collisions.
    "q196_segment_dedup" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), words(col("text")).as("t"))
        .filter(size(col("t")) > 0)
      val segs = docs.select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, int(ceil(size(t) / $SegLen.0)) - 1),
              i -> array_join(slice(t, i * $SegLen + 1, $SegLen), ' '))""")))
        .toDF("doc_id", "seg_idx", "seg")
      val firstSeen = Window.partitionBy("seg")
        .orderBy(col("doc_id"), col("seg_idx"))
      segs.withColumn("rn", row_number().over(firstSeen))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") === 1, length(col("seg")).cast("long"))
            .otherwise(0L)).as("kept_chars"))
    }),

    // ---- q197: source-balanced quality percentile gate -----------------
    // Raw score = avg token length in milli-chars (integer), ranked
    // WITHIN each source; keep the top 20% of every source. The
    // percentile is exact integer math ((rank-1)*1e6 div (n-1)) so the
    // cut is reproducible across engines — no floating percent_rank.
    // Both windows partition by source, so the plan is one hash shuffle
    // on source; n_sources never exceeds executor parallelism concerns
    // here, and a skewed mega-source would ride the same salting as
    // q57/q156.
    "q197_source_quantile_gate" -> ((s, d) => {
      val scored = table(s, d, "documents")
        .select(col("doc_id"), col("source"),
          expr("(n_chars * 1000) div " +
            "size(filter(split(lower(text), ' '), w -> length(w) > 0))")
            .as("score_milli"))
      val bySource = Window.partitionBy("source")
      val ordered = bySource.orderBy(col("score_milli"), col("doc_id"))
      scored
        .withColumn("rnk", rank().over(ordered).cast("long"))
        .withColumn("n", count(lit(1)).over(bySource))
        .withColumn("pct_micro", expr("((rnk - 1) * 1000000) div (n - 1)"))
        .filter(col("pct_micro") >= 800000)
        .select("doc_id", "source", "score_milli", "pct_micro")
    }),

    // ---- q198: per-document contamination fraction ---------------------
    // Benchmark split = docs with doc_id % 97 == 0 (q89's convention).
    // For every other document: the share of its DISTINCT 5-grams that
    // appear anywhere in the benchmark, as exact ppm. The benchmark gram
    // set is BROADCAST (it is the eval suite — small by construction at
    // any corpus scale), so the training corpus is scanned once and
    // never shuffled on gram text: the same posture as q89/q97, but
    // emitting the per-doc fraction the GPT-3-style doc-removal rule
    // thresholds on.
    "q198_contamination_frac" -> ((s, d) => {
      val grams = table(s, d, "documents")
        .select(col("doc_id"), words(col("text")).as("t"))
        .filter(size(col("t")) >= 5)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(t) - 5),
             i -> array_join(slice(t, i + 1, 5), ' '))""")).as("g"))
        .distinct()
      val bench = grams.filter(col("doc_id") % 97 === 0)
        .select("g").distinct().withColumn("hit", lit(1L))
      grams.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("frac_ppm", expr("(n_hit * 1000000) div n_grams"))
    }),

    // ---- q199: k-core peel (bounded rounds) ----------------------------
    // Same undirected customer(2k)/supplier(2k+1) trade graph as
    // q187/q119. K self-calibrates to half the average degree (integer
    // div — scale-free, engine-exact), then 3 peel rounds: drop nodes
    // with degree < K, restrict edges to survivors, repeat. Each round
    // is one groupBy(src) + two key joins — O(|E|) per round, the same
    // bounded-iteration shape as BFS/LPA; reaching a fixed point early
    // just makes the remaining rounds no-ops (that IS the k-core).
    // Driver-side state is 2 counts per round — bounded, like the CC
    // convergence probes.
    "q199_kcore_peel" -> ((s, d) => {
      import s.implicits._
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
      val k = edges
        .agg(expr("count(1) div (2 * count(distinct src))")).head.getLong(0)
      // Peeling is monotone (each round's survivor set is nested in the
      // previous round's), so equal consecutive (n_nodes, n_edges) means
      // the fixed point — the k-core — is reached and the remaining
      // rounds are provably identical: emit them without recomputing.
      // GraphIter drives the rounds in Chain mode — the step manages
      // its own materialization because per-round stats (counts) feed
      // the driver-side fixed-point shortcut, and each superseded edge
      // frame is released the moment its successor is counted; at real
      // depth GraphIter's periodic localCheckpoint bounds lineage.
      var last: Option[(Long, Long)] = None
      var fixed = false
      val buf = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
      GraphIter.run(edges, 3, 8, GraphIter.Chain) { (cur, r) =>
        if (fixed) { buf += ((r.toLong, last.get._1, last.get._2)); cur }
        else {
          // persist + count INLINE so each frame's materializing count
          // doubles as its stat — the former materialized()-then-
          // count() shape ran 4 jobs per round for 2 numbers (r11)
          val keep = cur
            .groupBy("src").agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= k)
            .select(col("src").as("id"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nKeep = keep.count()
          val next = cur
            .join(keep.select(col("id").as("src")), "src")
            .join(keep.select(col("id").as("dst")), "dst")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nEdges = next.count()
          cur.unpersist()
          val stats = (nKeep, nEdges)
          keep.unpersist()
          fixed = last.contains(stats)
          last = Some(stats)
          buf += ((r.toLong, stats._1, stats._2))
          next
        }
      }
      buf.toSeq.toDF("round", "n_nodes", "n_edges")
    }),

    // ---- q200: split-leakage audit -------------------------------------
    // Near-dup candidate pairs from q37's banded-MinHash LSH, joined to
    // the md5-hash split assignment; pairs whose endpoints land in
    // DIFFERENT splits are eval leakage. Composes two existing scale
    // postures (banded candidates — never all-pairs; hash splits —
    // stable under growth); the two split joins hash on doc_id.
    "q200_split_leakage" -> ((s, d) => {
      val pairs = TextOps.queries("q37_lsh_pairs")(s, d)
      val splits = table(s, d, "documents")
        .select(col("doc_id"), splitOf(col("doc_id")).as("split"))
      pairs
        .join(splits.select(col("doc_id").as("a_id"),
          col("split").as("split_a")), "a_id")
        .join(splits.select(col("doc_id").as("b_id"),
          col("split").as("split_b")), "b_id")
        .filter(col("split_a") =!= col("split_b"))
        .select("a_id", "b_id", "split_a", "split_b")
    }),

    // ---- q201: forward as-of (time-to-next-conversion) -----------------
    // For every click, the FIRST purchase by the same user at-or-after
    // the click, through the native as-of operator's forward direction —
    // the q70/q114 attribution shape mirrored in time. Same physical
    // cost as backward: two key exchanges + one sorted merge (the
    // forward API negates the ns timestamps and reuses the backward
    // exec). gap_ns is the conversion latency the funnel queries bucket.
    "q201_forward_asof" -> ((s, d) => {
      val ev = table(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
      graft.plans.AsOf.join(clicks, purchases, Seq("user_id"),
          "c_ts", "p_ts", tieBreak = Seq("purchase_id"),
          direction = "forward")
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (col("p_ts") - col("c_ts")).as("gap_ns"))
    }))

  val oracle: Map[String, String] = Map(
    "q196_segment_dedup" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split(lower(text), ' '),
                              w -> w <> '') AS t
           FROM documents),
         segs AS (
           SELECT doc_id,
                  unnest(range(CAST(ceil(len(t) / 20.0) AS BIGINT)))
                    AS seg_idx,
                  t
           FROM toks WHERE len(t) > 0),
         seg2 AS (
           SELECT doc_id, seg_idx,
                  array_to_string(t[seg_idx*20+1 : seg_idx*20+20], ' ')
                    AS seg
           FROM segs),
         ranked AS (
           SELECT doc_id, seg_idx, length(seg) AS seg_chars,
                  row_number() OVER (PARTITION BY seg
                                     ORDER BY doc_id, seg_idx) AS rn
           FROM seg2)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
                CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_kept,
                CAST(sum(CASE WHEN rn = 1 THEN seg_chars ELSE 0 END)
                  AS BIGINT) AS kept_chars
         FROM ranked GROUP BY doc_id""",
    "q197_source_quantile_gate" ->
      """WITH sc AS (
           SELECT doc_id, source,
                  (n_chars * 1000) //
                    len(list_filter(string_split(lower(text), ' '),
                                    w -> w <> '')) AS score_milli
           FROM documents),
         rk AS (
           SELECT doc_id, source, score_milli,
                  rank() OVER (PARTITION BY source
                               ORDER BY score_milli, doc_id) AS rnk,
                  count(*) OVER (PARTITION BY source) AS n
           FROM sc)
         SELECT doc_id, source, score_milli,
                CAST(((rnk - 1) * 1000000) // (n - 1) AS BIGINT)
                  AS pct_micro
         FROM rk WHERE ((rnk - 1) * 1000000) // (n - 1) >= 800000""",
    "q198_contamination_frac" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split(lower(text), ' '),
                              w -> w <> '') AS t
           FROM documents),
         grams AS (
           SELECT DISTINCT doc_id,
                  unnest(list_transform(range(0, len(t) - 4),
                    i -> array_to_string(t[i+1 : i+5], ' '))) AS g
           FROM toks WHERE len(t) >= 5),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit,
                CAST((sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                      * 1000000) // count(*) AS BIGINT) AS frac_ppm
         FROM grams LEFT JOIN bench b USING (g)
         WHERE doc_id % 97 <> 0
         GROUP BY doc_id""",
    "q199_kcore_peel" ->
      """WITH eo AS (
           SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM eo
                   UNION ALL SELECT dst, src FROM eo),
         kp AS (SELECT count(*) // (2 * count(DISTINCT src)) AS k
                FROM edges),
         deg0 AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
         keep1 AS (SELECT id FROM deg0, kp WHERE d >= k),
         e1 AS (SELECT e.src, e.dst FROM edges e
                JOIN keep1 a ON e.src = a.id JOIN keep1 b ON e.dst = b.id),
         deg1 AS (SELECT src AS id, count(*) AS d FROM e1 GROUP BY src),
         keep2 AS (SELECT id FROM deg1, kp WHERE d >= k),
         e2 AS (SELECT e.src, e.dst FROM e1 e
                JOIN keep2 a ON e.src = a.id JOIN keep2 b ON e.dst = b.id),
         deg2 AS (SELECT src AS id, count(*) AS d FROM e2 GROUP BY src),
         keep3 AS (SELECT id FROM deg2, kp WHERE d >= k),
         e3 AS (SELECT e.src, e.dst FROM e2 e
                JOIN keep3 a ON e.src = a.id JOIN keep3 b ON e.dst = b.id)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS round,
                  (SELECT CAST(count(*) AS BIGINT) FROM keep1) AS n_nodes,
                  (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
           UNION ALL
           SELECT 2, (SELECT count(*) FROM keep2),
                  (SELECT count(*) FROM e2)
           UNION ALL
           SELECT 3, (SELECT count(*) FROM keep3),
                  (SELECT count(*) FROM e3))""",
    "q200_split_leakage" ->
      s"""WITH pairs AS (${TextOps.oracle("q37_lsh_pairs")}),
         sp AS (
           SELECT doc_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                         1, 4)) AS BIGINT) % 10 < 8 THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                         1, 4)) AS BIGINT) % 10 = 8 THEN 'valid'
                  ELSE 'test' END AS split
           FROM documents)
         SELECT p.a_id, p.b_id, sa.split AS split_a, sb.split AS split_b
         FROM pairs p
         JOIN sp sa ON p.a_id = sa.doc_id
         JOIN sp sb ON p.b_id = sb.doc_id
         WHERE sa.split <> sb.split""",
    "q201_forward_asof" ->
      """SELECT c.user_id, c.event_id AS click_id,
                p.event_id AS purchase_id,
                epoch_ns(p.ts) - epoch_ns(c.ts) AS gap_ns
         FROM (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'click') c
         ASOF LEFT JOIN (SELECT user_id, event_id, ts FROM events
                         WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id AND c.ts <= p.ts""")
}
