package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 52: the privacy-release decision step, the dedup
  * threshold decision step, and the last missing retrieval metric.
  *
  *   - q290 k-anonymity generalization lattice: which QI
  *     generalization level first satisfies k≥10, and what each level
  *     costs in suppression — the decision a privacy release actually
  *     makes (q155 measures ONE grouping; this ranks the ladder).
  *   - q291 dedup threshold sweep: near-dup pair and flagged-doc
  *     counts as a function of the Jaccard cutoff — the operating
  *     curve a dedup deployment reads before committing to a
  *     threshold (complements q218's band-calibration S-curve).
  *   - q292 MRR@10, completing the retrieval-eval family next to
  *     NDCG (q239), AUC (q228) and the PR sweep (q231).
  */
object Wave52Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q290: k-anonymity generalization ladder ----------------------
    // Four nested QI levels — (type, dow) → (type, weekend) → (type) →
    // (*) — audited in ONE corpus pass: each row explodes onto its 4
    // level keys (map-side), one (level, key) count shuffle, then a
    // 4×|keys| rollup. Per level: group count, smallest group, rows
    // needing suppression under k=10 (members of any group smaller
    // than k) in floored ppm, and whether the level satisfies k≥10
    // outright. dow is (epoch-days + 4) % 7 (1970-01-01 was Thursday),
    // weekend = {Saturday=6, Sunday=0} — pinned identically in the
    // oracle.
    "q290_k_anon_generalization" -> ((s, d) => {
      val lv = table(s, d, "events")
        .select(col("event_type"),
          expr("(ts div 86400000000000 + 4) % 7").as("dow"))
        .withColumn("wkend",
          expr("CASE WHEN dow IN (0, 6) THEN 'we' ELSE 'wd' END"))
        .select(explode(array(
          struct(lit("L0_type_dow").as("level"),
            concat_ws("|", col("event_type"), col("dow")).as("key")),
          struct(lit("L1_type_weekend").as("level"),
            concat_ws("|", col("event_type"), col("wkend")).as("key")),
          struct(lit("L2_type").as("level"), col("event_type").as("key")),
          struct(lit("L3_all").as("level"), lit("*").as("key"))))
          .as("g"))
        .select(col("g.level").as("level"), col("g.key").as("key"))
      lv.groupBy("level", "key").agg(count(lit(1)).as("n"))
        .groupBy("level")
        .agg(count(lit(1)).as("n_groups"), min("n").as("k_min"),
          sum(when(col("n") < 10, col("n")).otherwise(0L))
            .as("n_suppressed"),
          sum("n").as("n_rows"))
        .select(col("level"), col("n_groups"), col("k_min"),
          expr("n_suppressed * 1000000 div n_rows").as("suppressed_ppm"),
          (col("k_min") >= 10).as("meets_k10"))
    }),

    // ---- q291: near-dup threshold operating curve ---------------------
    // Candidate pairs come from the banded-MinHash index (the q140
    // discipline: the exact-Jaccard verify touches ONLY candidates —
    // semi-filtered, broadcast id set — never the corpus); each pair's
    // exact integer jac_ppm is then swept across the 9 decile cutoffs
    // with a ≤9× bounded fan-out. Flagged docs per cutoff = distinct
    // members of any surviving pair. Grid-joined so a cutoff no pair
    // reaches still reports 0 — a missing operating point misleads
    // exactly when dedup is too aggressive.
    "q291_dedup_threshold_sweep" -> ((s, d) => {
      val jac = TextOps.verifiedJaccardPairs(s, d)
      val nDocs = table(s, d, "documents").agg(count(lit(1)).as("n_docs"))
      val grid = s.range(1, 10)
        .select((col("id") * 100000L).as("thr_ppm"))
      val swept = jac.crossJoin(grid)
        .filter(col("jac_ppm") >= col("thr_ppm")).persist()
      val byThr = swept.groupBy("thr_ppm").agg(count(lit(1)).as("n_pairs"))
      val flagged = swept
        .select(col("thr_ppm"),
          explode(array(col("a_id"), col("b_id"))).as("doc_id"))
        .groupBy("thr_ppm")
        .agg(countDistinct("doc_id").as("n_flagged"))
      grid.join(byThr, Seq("thr_ppm"), "left_outer")
        .join(flagged, Seq("thr_ppm"), "left_outer")
        .na.fill(0L, Seq("n_pairs", "n_flagged"))
        .crossJoin(broadcast(nDocs))
        .select(col("thr_ppm"), col("n_pairs"), col("n_flagged"),
          expr("n_flagged * 1000000 div n_docs").as("flagged_ppm"))
    }),

    // ---- q292: mean reciprocal rank at 10 ------------------------------
    // q239's retrieval setup verbatim (sources are the queries,
    // n_chars the model score, rel=2 the relevant grade) so the two
    // metrics grade the SAME ranking. Per source: the first rank ≤ 10
    // holding a rel-2 doc and its reciprocal in floored ppm (0 when
    // none); a final '__all__' row carries the MRR itself. Work: one
    // per-source window over the doc frame + a 1-row-per-source
    // aggregate — the corpus shuffles once on source.
    "q292_mrr_at_10" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("n_chars"),
          expr("CAST(CASE WHEN n_chars >= 400 THEN 2 WHEN n_chars >= 200" +
            " THEN 1 ELSE 0 END AS BIGINT)").as("rel"))
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val firsts = docs
        .withColumn("mr", row_number().over(w).cast("long"))
        .filter(col("mr") <= 10 && col("rel") === 2)
        .groupBy("source").agg(min("mr").as("first_rank"))
      val perSource = docs.select("source").distinct()
        .join(firsts, Seq("source"), "left_outer")
        .na.fill(0L, Seq("first_rank"))
        .withColumn("rr_ppm", expr(
          "CASE WHEN first_rank > 0 THEN 1000000 div first_rank ELSE 0 END"))
      perSource.unionByName(
        perSource.agg(
          lit("__all__").as("source"), lit(0L).as("first_rank"),
          expr("sum(rr_ppm) div count(1)").as("rr_ppm")))
    }))

  private[operators] val lshJacCtes =
    """toks AS (
         SELECT doc_id,
           list_filter(string_split(lower(text), ' '), w -> w <> '')
             AS tokens
         FROM documents),
       shingles AS (
         SELECT DISTINCT doc_id, shingle FROM (
           SELECT doc_id, unnest(list_transform(range(0, len(tokens) - 2),
             i -> array_to_string(list_slice(tokens, i + 1, i + 3), ' ')))
             AS shingle
           FROM toks WHERE len(tokens) >= 3)),
       sigs AS (
         SELECT doc_id,
           min(substr(md5(shingle), 1, 8)) AS s0,
           min(substr(md5(shingle), 9, 8)) AS s1,
           min(substr(md5(shingle), 17, 8)) AS s2,
           min(substr(md5(shingle), 25, 8)) AS s3
         FROM shingles GROUP BY doc_id),
       bands AS (
         SELECT doc_id, md5(s0 || s1) AS b0, md5(s2 || s3) AS b1
         FROM sigs),
       pairs AS (
         SELECT DISTINCT a_id, b_id FROM (
           SELECT l.doc_id AS a_id, r.doc_id AS b_id
           FROM bands l JOIN bands r
             ON l.b0 = r.b0 AND l.doc_id < r.doc_id
           UNION ALL
           SELECT l.doc_id AS a_id, r.doc_id AS b_id
           FROM bands l JOIN bands r
             ON l.b1 = r.b1 AND l.doc_id < r.doc_id)),
       sz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
       iv AS (
         SELECT p.a_id, p.b_id, count(*) AS inter
         FROM pairs p
         JOIN shingles x ON x.doc_id = p.a_id
         JOIN shingles y ON y.doc_id = p.b_id AND y.shingle = x.shingle
         GROUP BY 1, 2),
       jac AS (
         SELECT p.a_id, p.b_id,
           (coalesce(iv.inter, 0) * 1000000)
             // (za.sz + zb.sz - coalesce(iv.inter, 0)) AS jac_ppm
         FROM pairs p
         JOIN sz za ON za.doc_id = p.a_id
         JOIN sz zb ON zb.doc_id = p.b_id
         LEFT JOIN iv ON iv.a_id = p.a_id AND iv.b_id = p.b_id)"""

  val oracle: Map[String, String] = Map(
    "q290_k_anon_generalization" ->
      """WITH ev AS (
           SELECT event_type,
             (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow
           FROM events),
         lv AS (
           SELECT 'L0_type_dow' AS level,
                  event_type || '|' || CAST(dow AS VARCHAR) AS key
           FROM ev
           UNION ALL
           SELECT 'L1_type_weekend',
                  event_type || '|' ||
                  CASE WHEN dow IN (0, 6) THEN 'we' ELSE 'wd' END
           FROM ev
           UNION ALL
           SELECT 'L2_type', event_type FROM ev
           UNION ALL
           SELECT 'L3_all', '*' FROM ev),
         g AS (SELECT level, key, count(*) AS n FROM lv GROUP BY 1, 2)
         SELECT level, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(n) AS BIGINT) AS k_min,
           CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) * 1000000
                // sum(n) AS BIGINT) AS suppressed_ppm,
           min(n) >= 10 AS meets_k10
         FROM g GROUP BY level""",

    "q291_dedup_threshold_sweep" ->
      s"""WITH $lshJacCtes,
          grid AS (SELECT unnest(range(1, 10)) * 100000 AS thr_ppm),
          swept AS (
            SELECT g.thr_ppm, j.a_id, j.b_id
            FROM jac j JOIN grid g ON j.jac_ppm >= g.thr_ppm),
          np AS (SELECT thr_ppm, count(*) AS n_pairs
                 FROM swept GROUP BY 1),
          nf AS (
            SELECT thr_ppm, count(DISTINCT doc_id) AS n_flagged FROM (
              SELECT thr_ppm, a_id AS doc_id FROM swept
              UNION ALL
              SELECT thr_ppm, b_id FROM swept)
            GROUP BY 1),
          nd AS (SELECT count(*) AS n_docs FROM documents)
          SELECT CAST(grid.thr_ppm AS BIGINT) AS thr_ppm,
            CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
            CAST(coalesce(nf.n_flagged, 0) AS BIGINT) AS n_flagged,
            CAST(coalesce(nf.n_flagged, 0) * 1000000 // nd.n_docs
              AS BIGINT) AS flagged_ppm
          FROM grid
          LEFT JOIN np ON grid.thr_ppm = np.thr_ppm
          LEFT JOIN nf ON grid.thr_ppm = nf.thr_ppm
          CROSS JOIN nd""",

    "q292_mrr_at_10" ->
      """WITH docs AS (
           SELECT source, doc_id, n_chars,
             CAST(CASE WHEN n_chars >= 400 THEN 2
                       WHEN n_chars >= 200 THEN 1 ELSE 0 END AS BIGINT)
               AS rel
           FROM documents),
         ranked AS (
           SELECT source, rel, row_number() OVER (
             PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS mr
           FROM docs),
         firsts AS (
           SELECT source, min(mr) AS first_rank
           FROM ranked WHERE mr <= 10 AND rel = 2 GROUP BY 1),
         per AS (
           SELECT s.source,
             CAST(coalesce(f.first_rank, 0) AS BIGINT) AS first_rank,
             CAST(CASE WHEN coalesce(f.first_rank, 0) > 0
               THEN 1000000 // f.first_rank ELSE 0 END AS BIGINT) AS rr_ppm
           FROM (SELECT DISTINCT source FROM docs) s
           LEFT JOIN firsts f ON s.source = f.source)
         SELECT source, first_rank, rr_ppm FROM per
         UNION ALL
         SELECT '__all__', 0, CAST(sum(rr_ppm) // count(*) AS BIGINT)
         FROM per""")
}
