package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 49: cohort lifetime value.
  *
  * q281 the LTV curve: cumulative revenue per user-age week within
  * each first-seen cohort — q120's retention triangle with exact
  * cents value instead of user counts, the number a data-acquisition
  * decision actually prices against.
  */
object Wave49Ops {

  type Q = (SparkSession, String) => DataFrame

  private val NsPerWeek = 604800000000000L

  val queries: Map[String, Q] = Map(
    // ---- q281: cohort LTV curve ----------------------------------------
    // Two user-keyed stages (cohort assignment + join back — both
    // hash on user_id, co-partitioned with every other per-user
    // stage), a (cohort, age) rollup, and the cumulative window over
    // the cohorts×horizon triangle — calendar-bounded, never
    // corpus-sized. All cents integer-exact; ltv_per_user_cents
    // divides by the cohort's user count (floor) for the comparable
    // curve.
    "q281_cohort_ltv" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), expr(s"ts div ${NsPerWeek}L").as("wk"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val cohort = ev.groupBy("user_id")
        .agg(min("wk").as("cohort_wk"))
      val sizes = cohort.groupBy("cohort_wk")
        .agg(count(lit(1)).as("n_users"))
      val cell = ev.join(cohort, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("age_wk"))
        .agg(sum("cents").as("cents"))
      val wCum = Window.partitionBy("cohort_wk").orderBy("age_wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cell.withColumn("cum_cents", sum("cents").over(wCum))
        .join(broadcast(sizes), "cohort_wk")
        .select(col("cohort_wk"), col("age_wk"), col("n_users"),
          col("cents"), col("cum_cents"),
          expr("cum_cents div n_users").as("ltv_per_user_cents"))
    }))

  val oracle: Map[String, String] = Map(
    "q281_cohort_ltv" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
         cohort AS (
           SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
         sizes AS (
           SELECT cohort_wk, count(*) AS n_users FROM cohort GROUP BY 1),
         cell AS (
           SELECT c.cohort_wk, e.wk - c.cohort_wk AS age_wk,
             CAST(sum(e.cents) AS BIGINT) AS cents
           FROM ev e JOIN cohort c USING (user_id)
           GROUP BY 1, 2),
         cum AS (
           SELECT cohort_wk, age_wk, cents,
             CAST(sum(cents) OVER (PARTITION BY cohort_wk ORDER BY age_wk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_cents
           FROM cell)
         SELECT cohort_wk, age_wk, n_users, cents, cum_cents,
           cum_cents // n_users AS ltv_per_user_cents
         FROM cum JOIN sizes USING (cohort_wk)""")
}
