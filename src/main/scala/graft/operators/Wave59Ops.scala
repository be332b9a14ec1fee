package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 59: distributional comparisons — WHERE a shift lives,
  * not just whether the mean moved.
  *
  *   - q306 per-segment KS drift scan: each source's length
  *     distribution against its complement — the "which segment
  *     drifted" sweep a data-quality monitor runs per ingest batch
  *     (q229 computes one global KS; this localizes it).
  *   - q307 quantile treatment effects: decile-wise treated-vs-control
  *     outcome quantiles — the distributional view of q305's mean
  *     effect (a treatment can move the p90 while leaving the mean
  *     alone).
  */
object Wave59Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q306: which segment's distribution drifted? -------------------
    // One (source, value) histogram pass; the evaluation grid is
    // |sources| × |distinct values| (20 × ~300 here — domain-bounded,
    // NEVER corpus rows). Each source's inclusive CDF diffs against
    // its complement's (complement = global − source, computed by
    // joining the global per-value cumulative), both in floored ppm;
    // KS = max |diff| with the smallest attaining value as the
    // natural drift threshold. Ties and floors are deterministic in
    // both engines.
    "q306_segment_drift_scan" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("source"), col("n_chars").cast("long").as("v"))
      val byVal = docs.groupBy("source", "v").agg(count(lit(1)).as("n"))
      val srcTot = byVal.groupBy("source").agg(sum("n").as("n_src"))
      val gVal = byVal.groupBy("v").agg(sum("n").as("g_n"))
      val tot = gVal.agg(sum("g_n").as("n_all"))
      val grid = srcTot.crossJoin(gVal.select("v"))
      val wSrc = Window.partitionBy("source").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wG = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cdf = grid
        .join(byVal, Seq("source", "v"), "left_outer")
        .na.fill(0L, Seq("n"))
        .join(gVal.withColumn("g_cum", sum("g_n").over(wG))
          .select("v", "g_cum"), "v")
        .withColumn("s_cum", sum("n").over(wSrc))
        .crossJoin(broadcast(tot))
        .withColumn("diff", abs(
          expr("s_cum * 1000000 div n_src") -
            expr("(g_cum - s_cum) * 1000000 div (n_all - n_src)")))
      cdf.groupBy("source")
        .agg(max("diff").as("ks_ppm"))
        .join(cdf.select("source", "v", "diff"), "source")
        .filter(col("diff") === col("ks_ppm"))
        .groupBy("source", "ks_ppm")
        .agg(min("v").as("at_value"))
        .select("source", "ks_ppm", "at_value")
    }),

    // ---- q307: quantile treatment effects at the deciles ---------------
    // Arms are the q305 assignment (user parity), outcome the spend
    // cents. Per arm: the exact d/10-quantile for d = 1..9 as the
    // smallest value with cum·10 ≥ n·d (inclusive-CDF order statistic
    // on the per-arm value histogram — windows over the value DOMAIN,
    // the q181/q285 discipline). Output per decile: both arm
    // quantiles and their signed difference (plain subtraction — no
    // division, so no floor-semantics trap). A location-only view
    // (q305) cannot see a variance-widening treatment; this can.
    "q307_quantile_treatment_effect" -> ((s, d) => {
      val ev = table(s, d, "events").select(
        expr("user_id % 2").as("t"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val h = ev.groupBy("t", "cents").agg(count(lit(1)).as("c"))
      val wA = Window.partitionBy("t").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.withColumn("cum", sum("c").over(wA))
        .join(broadcast(
          h.groupBy("t").agg(sum("c").as("n_arm"))), "t")
      val dec = cum.crossJoin(
        broadcast(s.range(1, 10).select(col("id").as("decile"))))
        .filter(col("cum") * 10 >= col("n_arm") * col("decile"))
        .groupBy("t", "decile").agg(min("cents").as("q"))
      dec.groupBy("decile")
        .agg(max(when(col("t") === 1, col("q"))).as("q_treated"),
          max(when(col("t") === 0, col("q"))).as("q_control"))
        .withColumn("qte_cents", col("q_treated") - col("q_control"))
    }))

  val oracle: Map[String, String] = Map(
    "q306_segment_drift_scan" ->
      """WITH d AS (
           SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents),
         bv AS (SELECT source, v, count(*) AS n FROM d GROUP BY 1, 2),
         st AS (SELECT source, sum(n) AS n_src FROM bv GROUP BY 1),
         gv AS (SELECT v, sum(n) AS g_n FROM bv GROUP BY 1),
         tot AS (SELECT sum(g_n) AS n_all FROM gv),
         gc AS (SELECT v, sum(g_n) OVER (ORDER BY v
                  ROWS UNBOUNDED PRECEDING) AS g_cum FROM gv),
         grid AS (SELECT st.source, st.n_src, gv.v
                  FROM st CROSS JOIN gv),
         cdf AS (
           SELECT g.source, g.v,
             abs(sum(coalesce(bv.n, 0)) OVER (PARTITION BY g.source
                   ORDER BY g.v ROWS UNBOUNDED PRECEDING)
                 * 1000000 // g.n_src
               - (gc.g_cum
                  - sum(coalesce(bv.n, 0)) OVER (PARTITION BY g.source
                      ORDER BY g.v ROWS UNBOUNDED PRECEDING))
                 * 1000000 // (tot.n_all - g.n_src)) AS diff
           FROM grid g
           LEFT JOIN bv ON g.source = bv.source AND g.v = bv.v
           JOIN gc ON g.v = gc.v
           CROSS JOIN tot),
         mx AS (SELECT source, max(diff) AS ks_ppm
                FROM cdf GROUP BY 1)
         SELECT m.source, CAST(m.ks_ppm AS BIGINT) AS ks_ppm,
           CAST(min(c.v) AS BIGINT) AS at_value
         FROM mx m JOIN cdf c
           ON m.source = c.source AND c.diff = m.ks_ppm
         GROUP BY m.source, m.ks_ppm""",

    "q307_quantile_treatment_effect" ->
      """WITH ev AS (
           SELECT user_id % 2 AS t,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         h AS (SELECT t, cents, count(*) AS c FROM ev GROUP BY 1, 2),
         cum AS (
           SELECT t, cents, sum(c) OVER (PARTITION BY t ORDER BY cents
             ROWS UNBOUNDED PRECEDING) AS cum
           FROM h),
         na AS (SELECT t, sum(c) AS n_arm FROM h GROUP BY 1),
         dec AS (
           SELECT cum.t, dd.decile, min(cum.cents) AS q
           FROM cum
           JOIN na ON cum.t = na.t
           CROSS JOIN (SELECT unnest(range(1, 10)) AS decile) dd
           WHERE cum.cum * 10 >= na.n_arm * dd.decile
           GROUP BY 1, 2)
         SELECT CAST(decile AS BIGINT) AS decile,
           CAST(max(CASE WHEN t = 1 THEN q END) AS BIGINT) AS q_treated,
           CAST(max(CASE WHEN t = 0 THEN q END) AS BIGINT) AS q_control,
           CAST(max(CASE WHEN t = 1 THEN q END)
                - max(CASE WHEN t = 0 THEN q END) AS BIGINT) AS qte_cents
         FROM dec GROUP BY decile""")
}
