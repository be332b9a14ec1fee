package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 22: model-evaluation metrics — the scoring side of the
  * training-data loop (a curation pipeline that reweights/filters on a
  * model score needs the score AUDITED at the same corpus scale).
  *
  * Shared framing: score = event value in integer cents, binary label =
  * `event_type = 'purchase'` ("does spend predict purchase"). Every
  * metric reduces the corpus to a per-distinct-score histogram FIRST
  * (one map-side-combined shuffle keyed on the score), then runs the
  * classical cumulative-sum formulation over that histogram — the
  * histogram is |score-domain|-bounded (cents of a bounded monetary
  * range), so the ordered window after it is domain-sized, never
  * corpus-sized. All ratios are integer ppm, so the reports are
  * engine-exact (the float formulations differ in the last ulp across
  * engines and would be un-hash-checkable).
  *
  * Scale posture: the post-histogram ordered windows are
  * SinglePartition by design — domain-sized (bounded), never
  * corpus-sized. A score with an unbounded domain first buckets
  * (q231's recipe) or swaps the window for the two-phase distributed
  * prefix sum (q93's orderedCumsum); the metric formulas are unchanged.
  *
  *   - q228 ROC AUC via the tie-adjusted Mann–Whitney U, carried as
  *     2U so tie credit (½ per tied pair) stays integer.
  *   - q229 Kolmogorov–Smirnov separation: max CDF gap and the score
  *     threshold attaining it.
  *   - q230 calibration table: positive rate vs mean score per
  *     fixed-width score bin.
  *   - q231 precision/recall sweep over 100 threshold buckets — the
  *     operating-point curve, empty buckets materialized so the sweep
  *     is gapless.
  */
object Wave22Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Corpus → (cents, pos) scored frame: one narrow projection, reused
    * by all four metrics. */
  private def scored(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").select(
      expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
      expr("CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END " +
        "AS BIGINT)").as("pos"))

  /** Per-distinct-score (pos, neg) histogram — the sufficient statistic
    * for every rank metric below; map-side combined, domain-bounded. */
  private def hist(ev: DataFrame): DataFrame =
    ev.groupBy("cents")
      .agg(sum("pos").as("pos_s"), sum(expr("1 - pos")).as("neg_s"))

  val queries: Map[String, Q] = Map(
    // ---- q228: ROC AUC (tie-adjusted Mann–Whitney, integer 2U) ---------
    // AUC = P(score_pos > score_neg) + ½·P(tie). Per distinct score s:
    // pos_s·(2·neg_below + neg_s) contributes to 2U (ties earn 1 of 2).
    // The running neg count is a window over the DOMAIN-sized histogram.
    // u2·1e6 stays inside Long up to n_pos·n_neg ≈ 4.6e12 (≈2M balanced
    // rows); past that the division happens first (u2 div (npn2 div
    // 1e6)) or the accumulator widens to DECIMAL(38,0) — the plan shape
    // is unchanged. Output: one row, exact.
    "q228_roc_auc" -> ((s, d) => {
      val h = hist(scored(s, d))
      val below = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("cnb", coalesce(sum("neg_s").over(below), lit(0L)))
        .agg(sum(expr("pos_s * (2 * cnb + neg_s)")).as("u2"),
          sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          expr("u2 * 1000000L div (2 * n_pos * n_neg)").as("auc_ppm"))
    }),

    // ---- q229: Kolmogorov–Smirnov separation statistic -----------------
    // KS = max over thresholds of |CDF_pos − CDF_neg| (both in ppm of
    // their class totals, inclusive CDFs over the score histogram), plus
    // the smallest score attaining the max — the natural decision
    // threshold. Class totals ride a 1-row broadcast; the argmax is a
    // scalar-broadcast equi-join back into the domain-sized frame.
    "q229_ks_statistic" -> ((s, d) => {
      val h = hist(scored(s, d))
      val upTo = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = h.agg(sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"))
      val ks = h
        .withColumn("cum_pos", sum("pos_s").over(upTo))
        .withColumn("cum_neg", sum("neg_s").over(upTo))
        .crossJoin(broadcast(tot))
        .select(col("cents"), col("n_pos"), col("n_neg"),
          expr("abs(cum_pos * 1000000L div n_pos" +
            " - cum_neg * 1000000L div n_neg)").as("ks_ppm"))
      val best = ks.agg(max("ks_ppm").as("ks_ppm"))
      ks.join(broadcast(best), "ks_ppm")
        .groupBy("ks_ppm")
        .agg(min("cents").as("at_cents"),
          min("n_pos").as("n_pos"), min("n_neg").as("n_neg"))
    }),

    // ---- q230: calibration table (positive rate per score bin) ---------
    // Ten fixed-width score bins from the global max (1-row scalar
    // broadcast, q226's binning recipe): per bin the row count, positive
    // count, positive rate in ppm, and mean score — a calibrated score
    // shows rate monotone in mean_cents. One scan + one 10-row agg.
    "q230_calibration" -> ((s, d) => {
      val ev = scored(s, d)
      val mx = ev.agg(max("cents").as("m"))
      ev.crossJoin(broadcast(mx))
        .select(expr("cents div (m div 10 + 1)").as("bin"),
          col("cents"), col("pos"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
          sum("cents").as("sum_cents"))
        .select(col("bin"), col("n"), col("n_pos"),
          expr("n_pos * 1000000L div n").as("pos_rate_ppm"),
          expr("sum_cents div n").as("mean_cents"))
    }),

    // ---- q231: precision/recall threshold sweep ------------------------
    // 100 threshold buckets (width from the global max): predict
    // positive when cents ≥ bucket·width. TP and predicted-positive
    // counts are DESCENDING cumulative sums over the bucket histogram —
    // materialized gapless via range(100) + left join so empty buckets
    // inherit the correct cumulative (a missing bucket would otherwise
    // silently skip an operating point). Buckets with zero predicted
    // positives are dropped (precision undefined). 100-row window.
    "q231_pr_sweep" -> ((s, d) => {
      val ev = scored(s, d)
      val mx = ev.agg(max("cents").as("m"))
      val hb = ev.crossJoin(broadcast(mx))
        .select(expr("cents div (m div 100 + 1)").as("bucket"), col("pos"))
        .groupBy("bucket")
        .agg(sum("pos").as("pos_s"), count(lit(1)).as("all_s"))
      val tot = ev.agg(sum("pos").as("n_pos"))
      val desc = Window.orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.range(0, 100).select(col("id").as("bucket"))
        .join(hb, Seq("bucket"), "left_outer")
        .na.fill(0L, Seq("pos_s", "all_s"))
        .withColumn("tp", sum("pos_s").over(desc))
        .withColumn("pp", sum("all_s").over(desc))
        .filter(col("pp") > 0)
        .crossJoin(broadcast(tot)).crossJoin(broadcast(mx))
        .select(col("bucket"),
          expr("bucket * (m div 100 + 1)").as("thr_cents"),
          col("tp"), col("pp"),
          expr("tp * 1000000L div pp").as("precision_ppm"),
          expr("tp * 1000000L div n_pos").as("recall_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q228_roc_auc" ->
      """WITH ev AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
           FROM events),
         hist AS (
           SELECT cents, sum(pos) AS pos_s, sum(1 - pos) AS neg_s
           FROM ev GROUP BY 1),
         cum AS (
           SELECT pos_s, neg_s,
                  coalesce(sum(neg_s) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cnb
           FROM hist),
         agg AS (
           SELECT sum(pos_s * (2 * cnb + neg_s)) AS u2,
                  sum(pos_s) AS n_pos, sum(neg_s) AS n_neg
           FROM cum)
         SELECT CAST(n_pos AS BIGINT) AS n_pos,
                CAST(n_neg AS BIGINT) AS n_neg,
                CAST(u2 AS BIGINT) AS u2,
                CAST(u2 * 1000000 // (2 * n_pos * n_neg) AS BIGINT)
                  AS auc_ppm
         FROM agg""",
    "q229_ks_statistic" ->
      """WITH ev AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
           FROM events),
         hist AS (
           SELECT cents, sum(pos) AS pos_s, sum(1 - pos) AS neg_s
           FROM ev GROUP BY 1),
         tot AS (
           SELECT sum(pos_s) AS n_pos, sum(neg_s) AS n_neg FROM hist),
         frame AS (
           SELECT cents,
                  sum(pos_s) OVER (ORDER BY cents) AS cum_pos,
                  sum(neg_s) OVER (ORDER BY cents) AS cum_neg
           FROM hist),
         ks AS (
           SELECT cents, n_pos, n_neg,
                  abs(cum_pos * 1000000 // n_pos
                      - cum_neg * 1000000 // n_neg) AS ks_ppm
           FROM frame, tot)
         SELECT CAST(ks_ppm AS BIGINT) AS ks_ppm,
                CAST(min(cents) AS BIGINT) AS at_cents,
                CAST(min(n_pos) AS BIGINT) AS n_pos,
                CAST(min(n_neg) AS BIGINT) AS n_neg
         FROM ks WHERE ks_ppm = (SELECT max(ks_ppm) FROM ks)
         GROUP BY ks_ppm""",
    "q230_calibration" ->
      """WITH ev AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
           FROM events),
         mx AS (SELECT max(cents) AS m FROM ev),
         b AS (
           SELECT cents // (m // 10 + 1) AS bin, cents, pos FROM ev, mx),
         g AS (
           SELECT bin, count(*) AS n, sum(pos) AS n_pos,
                  sum(cents) AS sum_cents
           FROM b GROUP BY 1)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
                CAST(n_pos AS BIGINT) AS n_pos,
                CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_ppm,
                CAST(sum_cents // n AS BIGINT) AS mean_cents
         FROM g""",
    "q231_pr_sweep" ->
      """WITH ev AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
           FROM events),
         mx AS (SELECT max(cents) AS m FROM ev),
         hb AS (
           SELECT cents // (m // 100 + 1) AS bucket,
                  sum(pos) AS pos_s, count(*) AS all_s
           FROM ev, mx GROUP BY 1),
         fullb AS (
           SELECT r.bucket, coalesce(pos_s, 0) AS pos_s,
                  coalesce(all_s, 0) AS all_s
           FROM (SELECT unnest(range(100)) AS bucket) r
           LEFT JOIN hb ON hb.bucket = r.bucket),
         cum AS (
           SELECT bucket,
                  sum(pos_s) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS tp,
                  sum(all_s) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS pp
           FROM fullb),
         tot AS (SELECT sum(pos) AS n_pos FROM ev)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(bucket * (m // 100 + 1) AS BIGINT) AS thr_cents,
                CAST(tp AS BIGINT) AS tp, CAST(pp AS BIGINT) AS pp,
                CAST(tp * 1000000 // pp AS BIGINT) AS precision_ppm,
                CAST(tp * 1000000 // n_pos AS BIGINT) AS recall_ppm
         FROM cum, tot, mx WHERE pp > 0""")
}
