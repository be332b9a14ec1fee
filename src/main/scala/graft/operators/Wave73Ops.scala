package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 73: marketing analytics — multi-touch attribution
  * (first / last / linear credit per channel) and the weekly cohort
  * retention triangle. The attribution pair stage is a user-blocked
  * range join (the wave-19 slab shape: one equi-shuffle on user, time
  * residual as a join filter); the retention triangle folds the corpus
  * to (user, week) distinct activity in one pass.
  */
object Wave73Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q333: first/last/linear touch attribution ---------------------
    // Conversions = purchase events; touches = any other event by the
    // same user in the 7 days strictly before the conversion. Per
    // conversion: k touches; first/last picked by the exact
    // (ts, event_id) struct order; linear credit 1e6 div k micro-units
    // per touch (truncating — the documented remainder loss is < k
    // micro per conversion). Per channel out: touch volume, first/last
    // conversion counts, linear credit. Conversions with no touch
    // window drop out (nothing to attribute).
    "q333_touch_attribution" -> ((s, d) => {
      val ev = table(s, d, "events")
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"),
          col("event_id").as("pid"))
      val touch = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts").as("tts"),
          col("event_id").as("tid"), col("event_type").as("channel"))
      val pairs = conv.join(touch, Seq("user_id"))
        .filter(col("tts") < col("pts") &&
          col("tts") >= col("pts") - lit(7L * 86400000000000L))
      val perConv = pairs.groupBy("pid")
        .agg(count(lit(1)).as("k"),
          min(struct(col("tts"), col("tid"))).as("fst"),
          max(struct(col("tts"), col("tid"))).as("lst"))
      pairs.join(perConv, "pid")
        .select(col("channel"),
          (col("tts") === col("fst.tts") && col("tid") === col("fst.tid"))
            .cast("long").as("is_first"),
          (col("tts") === col("lst.tts") && col("tid") === col("lst.tid"))
            .cast("long").as("is_last"),
          expr("1000000 div k").as("credit"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touches"),
          sum("is_first").as("n_first"),
          sum("is_last").as("n_last"),
          sum("credit").as("linear_micro"))
    }),

    // ---- q334: weekly cohort retention triangle ------------------------
    // Cohort = the user's first active epoch-week; activity = distinct
    // (user, week); retention_ppm = active members at each week offset
    // over cohort size. Two corpus folds (first-week frame, activity
    // frame), one join on user, then the triangle is a
    // (cohorts × offsets)-bounded aggregate. Offset 0 is 1e6 by
    // construction — asserted in the spec.
    "q334_retention_triangle" -> ((s, d) => {
      val act = table(s, d, "events")
        .select(col("user_id"), expr("ts div 604800000000000").as("wk"))
        .distinct()
      val cohort = act.groupBy("user_id").agg(min("wk").as("c_wk"))
      val size = cohort.groupBy("c_wk")
        .agg(count(lit(1)).as("cohort_n"))
      act.join(cohort, "user_id")
        .groupBy(col("c_wk"), (col("wk") - col("c_wk")).as("wk_offset"))
        .agg(count(lit(1)).as("active_n"))
        .join(size, "c_wk")
        .select(col("c_wk").as("cohort_week"), col("wk_offset"),
          col("active_n"), col("cohort_n"),
          expr("active_n * 1000000 div cohort_n").as("retention_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q333_touch_attribution" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
           FROM events),
         conv AS (
           SELECT user_id, ts AS pts, event_id AS pid
           FROM ev WHERE event_type = 'purchase'),
         touch AS (
           SELECT user_id, ts AS tts, event_id AS tid,
             event_type AS channel
           FROM ev WHERE event_type <> 'purchase'),
         pairs AS (
           SELECT conv.pid, touch.channel, touch.tts, touch.tid
           FROM conv JOIN touch ON conv.user_id = touch.user_id
           WHERE touch.tts < conv.pts
             AND touch.tts >= conv.pts - 604800000000000),
         flagged AS (
           SELECT channel,
             CASE WHEN row_number() OVER (PARTITION BY pid
               ORDER BY tts, tid) = 1 THEN 1 ELSE 0 END AS is_first,
             CASE WHEN row_number() OVER (PARTITION BY pid
               ORDER BY tts DESC, tid DESC) = 1 THEN 1 ELSE 0 END
               AS is_last,
             1000000 // (count(*) OVER (PARTITION BY pid)) AS credit
           FROM pairs)
         SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(is_first) AS BIGINT) AS n_first,
           CAST(sum(is_last) AS BIGINT) AS n_last,
           CAST(sum(credit) AS BIGINT) AS linear_micro
         FROM flagged GROUP BY 1""",

    "q334_retention_triangle" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
             epoch_ns(ts) // 604800000000000 AS wk
           FROM events),
         cohort AS (
           SELECT user_id, min(wk) AS c_wk FROM act GROUP BY 1),
         sz AS (SELECT c_wk, count(*) AS cohort_n FROM cohort GROUP BY 1),
         tri AS (
           SELECT cohort.c_wk, act.wk - cohort.c_wk AS wk_offset,
             count(*) AS active_n
           FROM act JOIN cohort USING (user_id)
           GROUP BY 1, 2)
         SELECT tri.c_wk AS cohort_week, wk_offset,
           CAST(active_n AS BIGINT) AS active_n,
           CAST(cohort_n AS BIGINT) AS cohort_n,
           CAST(active_n * 1000000 // cohort_n AS BIGINT)
             AS retention_ppm
         FROM tri JOIN sz ON tri.c_wk = sz.c_wk""")
}
