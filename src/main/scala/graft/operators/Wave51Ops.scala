package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 51: drift scoring, register-sketch cardinality, and
  * step-layered flow analysis.
  *
  *   - q287 Population Stability Index: THE industry drift score
  *     (banking/model-monitoring standard), complementing the
  *     chi-square drift audit (q226) and KL term drift (q109) with
  *     the per-bin (p−q)·ln(p/q) decomposition over a time split.
  *   - q288 HyperLogLog distinct counts via the native bounded-state
  *     Aggregator (`functions/HllSketch.scala`) with its exact-integer
  *     estimator, audited against the exact distinct count.
  *   - q289 step-layered funnel transitions (the Sankey-diagram feed):
  *     q221's transition counts resolved BY JOURNEY POSITION, so
  *     step-1→2 behavior is distinguishable from step-4→5 behavior.
  */
object Wave51Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q287: PSI between the first and second half of the window ----
    // Time split at the midpoint of [min ts, max ts] (two 1-row
    // broadcast scalars). Two stacked features — the global spend
    // decile bin (q230's shared edges, so both halves bin identically)
    // and the event type. Shares are floored ppm per half; the PSI
    // contribution is (p−q)·ln(p'/q') with ln in the q99 floor(·1e6)
    // micro-nat discipline and zero shares clamped to 1 ppm (the
    // standard epsilon, documented as part of the metric). Since p−q
    // and ln(p/q) always share a sign the contribution is
    // non-negative, so truncating div == floor in both engines. Work:
    // two (feature, bin) histogram shuffles of ≤ a few dozen partials
    // each — one corpus pass per feature, any scale.
    "q287_psi_stability" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("ts"), col("event_type"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val bounds = ev.agg(min("ts").as("t0"), max("ts").as("t1"),
        max("cents").as("m"))
      val tagged = ev.crossJoin(broadcast(bounds))
        .withColumn("late",
          expr("CAST(ts >= t0 + (t1 - t0) div 2 AS BIGINT)"))
      def psi(binned: DataFrame, feature: String): DataFrame = {
        val g = binned.groupBy("bin")
          .agg(sum(expr("1 - late")).as("n_p"), sum("late").as("n_q"))
        val tot = g.agg(sum("n_p").as("tp"), sum("n_q").as("tq"))
        g.crossJoin(broadcast(tot))
          .select(lit(feature).as("feature"), col("bin"),
            expr("n_p * 1000000 div tp").as("p_ppm"),
            expr("n_q * 1000000 div tq").as("q_ppm"))
          .withColumn("psi_micro", expr(
            """(greatest(p_ppm, 1) - greatest(q_ppm, 1))
               * CAST(floor(ln(CAST(greatest(p_ppm, 1) AS DOUBLE)
                                / greatest(q_ppm, 1)) * 1000000) AS BIGINT)
               div 1000000"""))
      }
      psi(tagged.withColumn("bin",
          expr("CAST(cents div (m div 10 + 1) AS STRING)")), "value_bin")
        .unionByName(psi(
          tagged.withColumn("bin", col("event_type")), "event_type"))
    }),

    // ---- q288: HLL cardinality per event type, audited vs exact -------
    // The Aggregator path: 128 one-byte registers per group shipped
    // from each map partition (vs the exact countDistinct's shuffle of
    // the distinct keys themselves — the audit column). The 60-bit
    // input hash is derived portably from md5 IN THE QUERY, so the
    // oracle can rebuild the registers relationally and the pinned
    // integer estimator (HllSketch.scala) matches bit-for-bit.
    // Raw-estimator caveat: no small-range correction, so err_ppm
    // reflects the documented ±1.04/√128 ≈ 9% band, not a defect.
    "q288_hll_distinct" -> ((s, d) => {
      val hll = udaf(new graft.functions.HllSketch())
      table(s, d, "events")
        .select(col("event_type"), col("user_id"),
          expr("""CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),
               16, 10) AS BIGINT)""").as("h"))
        .groupBy("event_type")
        .agg(hll(col("h")).as("hll_est"),
          countDistinct("user_id").as("n_exact"))
        .withColumn("err_ppm",
          expr("abs(hll_est - n_exact) * 1000000 div n_exact"))
    }),

    // ---- q289: step-layered funnel transitions (Sankey feed) ----------
    // Each user's first 6 events (ts order, event_id tie-break) form
    // the journey prefix; transitions are counted per (step, from,
    // to), with per-step shares in floored ppm. One shuffle on
    // user_id for the per-user window (journey prefixes are bounded
    // by the step cap, so the window never sorts unbounded history —
    // the rank-1-of-6 cut is applied inside the same window pass),
    // then a tiny (step × types²) aggregate.
    "q289_funnel_sankey" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("step", row_number().over(w).cast("long"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("step") <= 5 && col("next_type").isNotNull)
        .groupBy(col("step"), col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("step_ppm",
          expr("n * 1000000 div sum(n) OVER (PARTITION BY step)")
            .cast("long"))
    }))

  val oracle: Map[String, String] = Map(
    "q287_psi_stability" ->
      """WITH ev AS (
           SELECT epoch_ns(ts) AS ts, event_type,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         bounds AS (SELECT min(ts) AS t0, max(ts) AS t1,
                           max(cents) AS m FROM ev),
         tagged AS (
           SELECT CASE WHEN ts >= t0 + (t1 - t0) // 2 THEN 1 ELSE 0 END
                    AS late,
                  CAST(cents // (m // 10 + 1) AS VARCHAR) AS vbin,
                  event_type
           FROM ev, bounds),
         stacked AS (
           SELECT 'value_bin' AS feature, vbin AS bin, late FROM tagged
           UNION ALL
           SELECT 'event_type', event_type, late FROM tagged),
         g AS (
           SELECT feature, bin, sum(1 - late) AS n_p, sum(late) AS n_q
           FROM stacked GROUP BY 1, 2),
         tot AS (
           SELECT feature, sum(n_p) AS tp, sum(n_q) AS tq
           FROM g GROUP BY 1)
         SELECT g.feature, g.bin,
           CAST(n_p * 1000000 // tp AS BIGINT) AS p_ppm,
           CAST(n_q * 1000000 // tq AS BIGINT) AS q_ppm,
           CAST((greatest(n_p * 1000000 // tp, 1)
                 - greatest(n_q * 1000000 // tq, 1))
                * CAST(floor(ln(CAST(greatest(n_p * 1000000 // tp, 1)
                                  AS DOUBLE)
                                / greatest(n_q * 1000000 // tq, 1))
                             * 1000000) AS BIGINT)
                // 1000000 AS BIGINT) AS psi_micro
         FROM g JOIN tot ON g.feature = tot.feature""",

    "q288_hll_distinct" ->
      """WITH h AS (
           SELECT event_type, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               AS BIGINT) AS h
           FROM events),
         b AS (
           SELECT event_type, h // 9007199254740992 AS bucket,
                  h % 9007199254740992 AS rest
           FROM h),
         r AS (
           SELECT event_type, bucket,
             CASE WHEN rest = 0 THEN 54
                  ELSE 54 - length(format('{:b}', rest)) END AS rho
           FROM b),
         reg AS (SELECT event_type, bucket, max(rho) AS rr
                 FROM r GROUP BY 1, 2),
         grid AS (
           SELECT g.event_type, t.bucket
           FROM (SELECT DISTINCT event_type FROM h) g
           CROSS JOIN (SELECT unnest(range(0, 128)) AS bucket) t),
         full_reg AS (
           SELECT grid.event_type, coalesce(reg.rr, 0) AS rr
           FROM grid LEFT JOIN reg
             ON grid.event_type = reg.event_type
             AND grid.bucket = reg.bucket),
         s AS (
           SELECT event_type,
             sum(CAST(1 AS BIGINT) << (48 - least(rr, 48))) AS sv
           FROM full_reg GROUP BY 1),
         est AS (
           SELECT event_type,
             CAST(CAST(715275 AS HUGEINT)
                  * (4611686018427387904 // sv) // 1000000 AS BIGINT)
               AS hll_est
           FROM s),
         exact AS (
           SELECT event_type, count(DISTINCT user_id) AS n_exact
           FROM h GROUP BY 1)
         SELECT e.event_type, e.hll_est,
           CAST(x.n_exact AS BIGINT) AS n_exact,
           CAST(abs(e.hll_est - x.n_exact) * 1000000 // x.n_exact
             AS BIGINT) AS err_ppm
         FROM est e JOIN exact x ON e.event_type = x.event_type""",

    "q289_funnel_sankey" ->
      """WITH seq AS (
           SELECT event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS step,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         g AS (
           SELECT CAST(step AS BIGINT) AS step, event_type AS from_type,
                  next_type AS to_type, count(*) AS n
           FROM seq WHERE step <= 5 AND next_type IS NOT NULL
           GROUP BY 1, 2, 3)
         SELECT step, from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // sum(n) OVER (PARTITION BY step)
             AS BIGINT) AS step_ppm
         FROM g""")
}
