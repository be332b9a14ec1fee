package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 61: experiment-design numerics — the variance tooling
  * around the A/B machinery (q246 raw diff, q304 SPRT, q305
  * stratification, q307 QTE).
  *
  *   - q309 CUPED adjustment (Deng et al., WSDM 2013): use each
  *     user's PRE-period spend as the control covariate, estimate
  *     θ = cov(x,y)/var(x) on pooled users, and report the adjusted
  *     treatment difference plus the variance-reduction factor ρ² —
  *     the standard trick that makes experiments read weeks earlier.
  *     All moments are exact integer sums lifted into DECIMAL(38,0)
  *     (Spark) / HUGEINT (DuckDB) for the big products, with floored
  *     ppm divisions — bit-equal across engines.
  *   - q310 power analysis: the minimum detectable effect of the
  *     current sample at α=0.05 (two-sided) / 80% power, from the
  *     pooled conversion rate — MDE = (z₀.₉₇₅+z₀.₈)·√(2p(1−p)/n),
  *     z constants pinned in micro units, √ on an exact integer
  *     argument (IEEE sqrt is correctly rounded, so both engines
  *     agree bit-for-bit).
  */
object Wave61Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q309: CUPED-adjusted treatment effect -------------------------
    // Per user: x = pre-period spend cents (first half of the time
    // window), y = post-period spend cents, t = parity assignment.
    // One per-user aggregate (the corpus pass), then all second
    // moments from ONE pass over the user frame. θ and ρ² use the
    // n·Sxy − Sx·Sy forms whose products overflow i64 — DECIMAL(38,0)
    // carries them exactly. Output one row: θ (ppm), raw and adjusted
    // differences (micro-cents), and ρ² (the variance-reduction
    // fraction, ppm).
    "q309_cuped_adjustment" -> ((s, d) => {
      val ev = table(s, d, "events")
      val bounds = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
      val users = ev.crossJoin(broadcast(bounds))
        .withColumn("late",
          expr("CAST(ts >= t0 + (t1 - t0) div 2 AS BIGINT)"))
        .groupBy("user_id")
        .agg(
          sum(expr("(1 - late) * CAST(floor(value * 100) AS BIGINT)"))
            .as("x"),
          sum(expr("late * CAST(floor(value * 100) AS BIGINT)"))
            .as("y"))
        .withColumn("t", expr("user_id % 2"))
      val m = users.agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("t") === 1, col("x")).otherwise(0L)).as("sxt"),
        sum(when(col("t") === 1, col("y")).otherwise(0L)).as("syt"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("t") === 0, col("x")).otherwise(0L)).as("sxc"),
        sum(when(col("t") === 0, col("y")).otherwise(0L)).as("syc"))
      // All divisions are EXACT integral `div` on DECIMAL(38,0)
      // numerators (quotients fit i64) — Spark `div` and DuckDB `//`
      // both truncate toward zero on integers, so signed values agree
      // with no floor/round divergence (verified empirically; the
      // decimal `/`+floor route rounds at result scale and floors,
      // neither of which HUGEINT `//` does).
      m
        .withColumn("theta_ppm", expr("""CAST(
            (CAST(n AS DECIMAL(38,0)) * sxy
             - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
            div (CAST(n AS DECIMAL(38,0)) * sxx
               - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)"""))
        .withColumn("raw_diff_micro", expr("""CAST(
            (CAST(syt AS DECIMAL(38,0)) * nc
             - CAST(syc AS DECIMAL(38,0)) * nt) * 1000000
            div (CAST(nt AS DECIMAL(38,0)) * nc) AS BIGINT)"""))
        .withColumn("x_diff_micro", expr("""CAST(
            (CAST(sxt AS DECIMAL(38,0)) * nc
             - CAST(sxc AS DECIMAL(38,0)) * nt) * 1000000
            div (CAST(nt AS DECIMAL(38,0)) * nc) AS BIGINT)"""))
        .withColumn("adj_diff_micro", expr(
          "raw_diff_micro - (theta_ppm * x_diff_micro div 1000000)"))
        .withColumn("rho2_ppm", expr("""CAST(
            (CAST(n AS DECIMAL(38,0)) * sxy
             - CAST(sx AS DECIMAL(38,0)) * sy)
            * (CAST(n AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
            div ((CAST(n AS DECIMAL(38,0)) * sxx
                - CAST(sx AS DECIMAL(38,0)) * sx)
               * (CAST(n AS DECIMAL(38,0)) * syy
                  - CAST(sy AS DECIMAL(38,0)) * sy)) AS BIGINT)"""))
        .select(col("n").as("n_users"), col("theta_ppm"),
          col("raw_diff_micro"), col("x_diff_micro"),
          col("adj_diff_micro"), col("rho2_ppm"))
    }),

    // ---- q310: minimum detectable effect of the current sample ---------
    // Pooled conversion p from the corpus, per-arm n from the parity
    // split. MDE in ppm of conversion probability; also relative to p.
    // √ runs on an exactly-representable integer expression, and the
    // z-sum (1959964 + 841621 micro) is a pinned literal — so the
    // double path is deterministic across engines.
    "q310_power_mde" -> ((s, d) => {
      val ev = table(s, d, "events").select(
        expr("user_id % 2").as("t"),
        expr("CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END " +
          "AS BIGINT)").as("pos"))
      ev.agg(count(lit(1)).as("n_total"), sum("pos").as("n_pos"),
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_treat"))
        .select(
          col("n_total"), col("n_treat"),
          (col("n_total") - col("n_treat")).as("n_control"),
          expr("n_pos * 1000000 div n_total").as("p_ppm"),
          expr("""CAST(floor(2801585
              * sqrt(CAST(2 * (n_pos * 1000000 div n_total)
                     * (1000000 - n_pos * 1000000 div n_total)
                     AS DOUBLE)
                   / least(n_treat, n_total - n_treat))
              / 1000000) AS BIGINT)""").as("mde_ppm"))
        .withColumn("mde_rel_ppm",
          expr("mde_ppm * 1000000 div p_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q309_cuped_adjustment" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) AS ts,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         bounds AS (SELECT min(ts) AS t0, max(ts) AS t1 FROM ev),
         users AS (
           SELECT user_id,
             sum(CASE WHEN ts < t0 + (t1 - t0) // 2 THEN cents ELSE 0
               END) AS x,
             sum(CASE WHEN ts >= t0 + (t1 - t0) // 2 THEN cents ELSE 0
               END) AS y,
             user_id % 2 AS t
           FROM ev, bounds GROUP BY user_id),
         m AS (
           SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS nt,
             sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS sxt,
             sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS syt,
             sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS nc,
             sum(CASE WHEN t = 0 THEN x ELSE 0 END) AS sxc,
             sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS syc
           FROM users),
         d AS (
           SELECT n,
             CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                  * 1000000
                  // (CAST(n AS HUGEINT) * sxx
                     - CAST(sx AS HUGEINT) * sx) AS BIGINT)
               AS theta_ppm,
             CAST((CAST(syt AS HUGEINT) * nc
                   - CAST(syc AS HUGEINT) * nt) * 1000000
                  // (CAST(nt AS HUGEINT) * nc) AS BIGINT)
               AS raw_diff_micro,
             CAST((CAST(sxt AS HUGEINT) * nc
                   - CAST(sxc AS HUGEINT) * nt) * 1000000
                  // (CAST(nt AS HUGEINT) * nc) AS BIGINT)
               AS x_diff_micro,
             CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                  * (CAST(n AS HUGEINT) * sxy
                     - CAST(sx AS HUGEINT) * sy) * 1000000
                  // ((CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx)
                     * (CAST(n AS HUGEINT) * syy
                        - CAST(sy AS HUGEINT) * sy)) AS BIGINT)
               AS rho2_ppm
           FROM m)
         SELECT CAST(n AS BIGINT) AS n_users, theta_ppm,
           raw_diff_micro, x_diff_micro,
           raw_diff_micro - (theta_ppm * x_diff_micro // 1000000)
             AS adj_diff_micro,
           rho2_ppm
         FROM d""",

    "q310_power_mde" ->
      """WITH ev AS (
           SELECT user_id % 2 AS t,
             CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS BIGINT) AS pos
           FROM events),
         m AS (
           SELECT count(*) AS n_total, sum(pos) AS n_pos,
             sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n_treat
           FROM ev)
         SELECT n_total, CAST(n_treat AS BIGINT) AS n_treat,
           CAST(n_total - n_treat AS BIGINT) AS n_control,
           CAST(n_pos * 1000000 // n_total AS BIGINT) AS p_ppm,
           CAST(floor(2801585
             * sqrt(CAST(2 * (n_pos * 1000000 // n_total)
                    * (1000000 - n_pos * 1000000 // n_total)
                    AS DOUBLE)
                  / least(n_treat, n_total - n_treat))
             / 1000000) AS BIGINT) AS mde_ppm,
           CAST(CAST(floor(2801585
             * sqrt(CAST(2 * (n_pos * 1000000 // n_total)
                    * (1000000 - n_pos * 1000000 // n_total)
                    AS DOUBLE)
                  / least(n_treat, n_total - n_treat))
             / 1000000) AS BIGINT) * 1000000
             // (n_pos * 1000000 // n_total) AS BIGINT) AS mde_rel_ppm
         FROM m""")
}
