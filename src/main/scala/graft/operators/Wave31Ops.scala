package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 31: experimentation and state-over-time analytics.
  *
  *   - q245 time-weighted average value per user: each event's value
  *     "holds" until the next event (the state-over-time semantics
  *     behind TWAP, average balance, fleet-utilization metrics) —
  *     integer second-weighted, engine-exact.
  *   - q246 A/B experiment audit: hash-split cohorts, per-cohort
  *     conversion in ppm, and the chi-square-style significance
  *     contribution on the pooled expectation — the readout an
  *     experimentation platform renders.
  */
object Wave31Ops {

  type Q = (SparkSession, String) => DataFrame

  /** End of the events month (2024-02-01 00:00 UTC): the horizon the
    * last event's value holds to in q245. */
  private val HorizonSec = 1706745600L

  private def h13(c: String): String =
    s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 13), 16, 10) AS BIGINT)"

  val queries: Map[String, Q] = Map(
    // ---- q245: time-weighted average value per user --------------------
    // dt = seconds to the user's next event (the horizon constant for
    // the last one); twa = Σ(cents·dt) div Σ(dt). One user-partitioned
    // lead window + one user-keyed rollup — both hash on the user, so
    // a billion users spread freely; per-user state is one ordered
    // pass. cents·dt ≤ 49k·2.6M ≈ 1.3e11 per event — sums stay deep
    // inside Long at any per-user event count that fits a month.
    "q245_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
      table(s, d, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000000").as("sec"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        .withColumn("dt", coalesce(lead("sec", 1).over(w), lit(HorizonSec))
          - col("sec"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum("dt").as("held_sec"),
          sum(expr("cents * dt")).as("wsum"))
        .select(col("user_id"), col("n_events"), col("held_sec"),
          expr("wsum div held_sec").as("twa_cents"))
    }),

    // ---- q246: A/B experiment audit ------------------------------------
    // Cohort = md5(user) % 2 — the assignment IS the experiment
    // bucketing (pure map-side hash, stable under re-runs and corpus
    // growth, the q225 construction). Per cohort: users exposed,
    // converting users (any purchase), conversion ppm; plus the
    // chi-square-style contribution of each cohort against the pooled
    // rate on the ppm scale (integer, q226's recipe) — rank the
    // contributions and you have the significance readout. One
    // user-keyed rollup + a 2-row report.
    "q246_ab_experiment" -> ((s, d) => {
      val perUser = table(s, d, "events")
        .select(col("user_id"), col("event_type"))
        .groupBy("user_id")
        .agg(max(expr("CASE WHEN event_type = 'purchase' THEN 1L" +
          " ELSE 0L END")).as("converted"))
        .withColumn("cohort", expr(s"${h13("user_id")} % 2"))
      val tot = perUser.agg(count(lit(1)).as("t_users"),
        sum("converted").as("t_conv"))
      perUser.groupBy("cohort")
        .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv"))
        .crossJoin(broadcast(tot))
        .select(col("cohort"), col("n_users"), col("n_conv"),
          expr("n_conv * 1000000L div n_users").as("rate_ppm"),
          expr("t_conv * 1000000L div t_users").as("pooled_ppm"))
        .withColumn("chi2_contrib", expr(
          "(rate_ppm - pooled_ppm) * (rate_ppm - pooled_ppm)" +
            " div greatest(pooled_ppm, 1L)"))
    }))

  val oracle: Map[String, String] = Map(
    "q245_time_weighted_avg" ->
      """WITH ev AS (
           SELECT user_id, event_id,
                  epoch_ns(ts) // 1000000000 AS sec,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         d AS (
           SELECT user_id,
                  coalesce(lead(sec, 1) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id), 1706745600) - sec AS dt,
                  cents
           FROM ev)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(dt) AS BIGINT) AS held_sec,
                CAST(sum(cents * dt) // sum(dt) AS BIGINT) AS twa_cents
         FROM d GROUP BY 1""",
    "q246_ab_experiment" ->
      """WITH pu0 AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS converted
           FROM events GROUP BY 1),
         pu AS (
           SELECT user_id, converted,
                  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                    1, 13)) AS BIGINT) % 2 AS cohort
           FROM pu0),
         tot AS (
           SELECT count(*) AS t_users, sum(converted) AS t_conv FROM pu),
         c AS (
           SELECT cohort, count(*) AS n_users, sum(converted) AS n_conv
           FROM pu GROUP BY 1),
         r AS (
           SELECT cohort, n_users, n_conv,
                  n_conv * 1000000 // n_users AS rate_ppm,
                  t_conv * 1000000 // t_users AS pooled_ppm
           FROM c CROSS JOIN tot)
         SELECT CAST(cohort AS BIGINT) AS cohort,
                CAST(n_users AS BIGINT) AS n_users,
                CAST(n_conv AS BIGINT) AS n_conv,
                CAST(rate_ppm AS BIGINT) AS rate_ppm,
                CAST(pooled_ppm AS BIGINT) AS pooled_ppm,
                CAST((rate_ppm - pooled_ppm) * (rate_ppm - pooled_ppm)
                     // greatest(pooled_ppm, 1) AS BIGINT)
                  AS chi2_contrib
         FROM r""")
}
