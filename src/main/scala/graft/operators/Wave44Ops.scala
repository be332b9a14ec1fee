package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 44: off-policy evaluation + probabilistic forecast
  * scoring.
  *
  *   - q273 offline bandit replay (Li et al.'s replay method): evaluate
  *     a deterministic hash policy against logged events — the
  *     counterfactual "what would this policy have earned" estimator.
  *   - q274 pinball (quantile) loss: score the lag-7 forecast at
  *     τ ∈ {0.1, 0.5, 0.9} — the quantile-forecast metric, exact in
  *     integer ppm·cents.
  */
object Wave44Ops {

  type Q = (SparkSession, String) => DataFrame

  private val Taus = Seq(100000L, 500000L, 900000L)

  val queries: Map[String, Q] = Map(
    // ---- q273: offline bandit replay -----------------------------------
    // Arms are the event types (indexed by sorted order — a tiny
    // broadcast frame). The evaluated policy picks arm
    // md5(user_id) % |arms| — deterministic, so the replay is
    // reproducible under any partitioning. Replay keeps exactly the
    // logged events whose arm equals the policy's choice (unbiased
    // under uniform logging) and reports each arm's matched count,
    // exact cents value, and the overall match rate. One broadcast
    // arm-index join + one rollup; the corpus shuffles once on the
    // arm key.
    "q273_bandit_replay" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val arms = ev.select(col("event_type").as("arm")).distinct()
        .withColumn("arm_idx",
          (row_number().over(Window.orderBy("arm")) - 1).cast("long"))
      val nArms = arms.agg(count(lit(1)).as("n_arms"))
      val chosen = ev
        .crossJoin(broadcast(nArms))
        .withColumn("chosen_idx", expr(
          """CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 13),
               16, 10) AS BIGINT) % n_arms"""))
        .join(broadcast(arms), col("event_type") === col("arm"))
      val tot = ev.agg(count(lit(1)).as("n_total"))
      chosen.filter(col("arm_idx") === col("chosen_idx"))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_matched"), sum("cents").as("sum_cents"))
        .crossJoin(broadcast(tot))
        .select(col("arm"), col("n_matched"), col("sum_cents"),
          expr("sum_cents div n_matched").as("avg_cents"),
          expr("n_matched * 1000000 div n_total").as("match_ppm"))
    }),

    // ---- q274: pinball (quantile) loss of the lag-7 forecast -----------
    // q262's calendar-bounded daily series and lag; the loss at each
    // τ is max(τ·e, (τ−1e6)·e) on the ppm scale — both branches are
    // integer products, and the max formulation avoids any sign
    // division. The 3 τ values explode map-side from a literal array;
    // output is (type, τ) grain.
    "q274_pinball_loss" -> ((s, d) => {
      val daily = table(s, d, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily.withColumn("yhat", lag("y", 7).over(w))
        .filter(col("yhat").isNotNull)
        .select(col("event_type"), (col("y") - col("yhat")).as("e"),
          explode(lit(Taus.toArray)).as("tau_ppm"))
        .groupBy("event_type", "tau_ppm")
        .agg(count(lit(1)).as("n_days"),
          sum(greatest(expr("tau_ppm * e"),
            expr("(tau_ppm - 1000000) * e"))).as("pinball_ppm_cents"))
    }))

  val oracle: Map[String, String] = Map(
    "q273_bandit_replay" ->
      """WITH ev AS (
           SELECT user_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
         arms AS (
           SELECT arm, CAST(row_number() OVER (ORDER BY arm) - 1
             AS BIGINT) AS arm_idx
           FROM (SELECT DISTINCT event_type AS arm FROM ev)),
         na AS (SELECT count(*) AS n_arms FROM arms),
         tot AS (SELECT count(*) AS n_total FROM ev),
         matched AS (
           SELECT e.event_type AS arm, e.cents
           FROM ev e JOIN arms a ON e.event_type = a.arm
           CROSS JOIN na
           WHERE a.arm_idx =
             CAST(('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 1, 13))
               AS BIGINT) % na.n_arms)
         SELECT arm, count(*) AS n_matched,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(cents) // count(*) AS BIGINT) AS avg_cents,
           count(*) * 1000000 // n_total AS match_ppm
         FROM matched CROSS JOIN tot
         GROUP BY arm, n_total""",

    "q274_pinball_loss" ->
      """WITH daily AS (
           SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
           FROM events GROUP BY 1, 2),
         f AS (
           SELECT event_type,
             y - lag(y, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS e
           FROM daily),
         x AS (
           SELECT event_type, e, unnest([100000, 500000, 900000])
             AS tau_ppm
           FROM f WHERE e IS NOT NULL)
         SELECT event_type, CAST(tau_ppm AS BIGINT) AS tau_ppm,
           count(*) AS n_days,
           CAST(sum(greatest(tau_ppm * e, (tau_ppm - 1000000) * e))
             AS BIGINT) AS pinball_ppm_cents
         FROM x GROUP BY 1, 2""")
}
