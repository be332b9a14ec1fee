package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 88: engagement-quality profiles — session depth
  * distribution with bounce rate (the first report any web-analytics
  * stack ships) and purchase-cadence overdue factors (which customers
  * are past their personal re-order rhythm — the churn-risk list a
  * CRM team actually pulls).
  */
object Wave88Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q363: session depth distribution + bounce rate ----------------
    // Sessions by the corpus 30-min gap convention; per-session event
    // counts fold to a depth histogram (clamped at 10+ so the frame
    // is ≤10 rows at any corpus). Bounce = the depth-1 share. One
    // user-windowed pass + one tiny aggregate.
    "q363_session_depth_profile" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapNs = 1800L * 1000000000L
      val depth = table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag("ts", 1).over(w))
        .withColumn("new_s",
          (col("prev").isNull || col("ts") - col("prev") > gapNs)
            .cast("long"))
        .withColumn("sid", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"))
      depth
        .groupBy(expr("least(10, n_events)").as("depth"))
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("n_events"))
        .withColumn("share_ppm",
          expr("n_sessions * 1000000 div sum(n_sessions) OVER ()"))
    }),

    // ---- q364: purchase-cadence overdue factors -------------------------
    // Per repeat purchaser: mean inter-purchase gap by TELESCOPING —
    // (last − first) div (n − 1), so no per-gap frame exists at all;
    // overdue factor = time-since-last over the personal mean gap, in
    // ppm; clamped half-cadence buckets. Customers at factor ≥ 2× are
    // the churn-risk list. One purchase fold, integer throughout.
    "q364_overdue_customers" -> ((s, d) => {
      // second resolution: ns·1e6 products overflow i64, seconds don't
      val mx = table(s, d, "events")
        .agg(max(expr("ts div 1000000000")).as("max_ts"))
      val per = table(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_buys"),
          min(expr("ts div 1000000000")).as("t_first"),
          max(expr("ts div 1000000000")).as("t_last"))
        .filter(col("n_buys") >= 2)
        .withColumn("mean_gap",
          expr("(t_last - t_first) div (n_buys - 1)"))
        .filter(col("mean_gap") > 0)
      per.crossJoin(broadcast(mx))
        .withColumn("overdue_ppm",
          expr("(max_ts - t_last) * 1000000 div mean_gap"))
        .groupBy(expr("least(8, overdue_ppm div 500000)").as("bucket"))
        .agg(count(lit(1)).as("n_users"),
          min("overdue_ppm").as("min_overdue_ppm"),
          max("overdue_ppm").as("max_overdue_ppm"))
        .withColumn("share_ppm",
          expr("n_users * 1000000 div sum(n_users) OVER ()"))
    }))

  val oracle: Map[String, String] = Map(
    "q363_session_depth_profile" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) AS ts, event_id FROM events),
         flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > 1800000000000
               THEN 1 ELSE 0 END AS new_s
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM flagged),
         depth AS (
           SELECT user_id, sid, count(*) AS n_events
           FROM sess GROUP BY 1, 2),
         g AS (
           SELECT least(10, n_events) AS depth,
             count(*) AS n_sessions, sum(n_events) AS n_events
           FROM depth GROUP BY 1)
         SELECT CAST(depth AS BIGINT) AS depth,
           CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_sessions * 1000000 // sum(n_sessions) OVER ()
             AS BIGINT) AS share_ppm
         FROM g""",

    "q364_overdue_customers" ->
      """WITH mx AS (
           SELECT max(epoch_ns(ts) // 1000000000) AS max_ts
           FROM events),
         per AS (
           SELECT user_id, count(*) AS n_buys,
             min(epoch_ns(ts) // 1000000000) AS t_first,
             max(epoch_ns(ts) // 1000000000) AS t_last
           FROM events WHERE event_type = 'purchase'
           GROUP BY 1 HAVING count(*) >= 2),
         f AS (
           SELECT user_id,
             (t_last - t_first) // (n_buys - 1) AS mean_gap, t_last
           FROM per),
         o AS (
           SELECT (max_ts - t_last) * 1000000 // mean_gap
             AS overdue_ppm
           FROM f, mx WHERE mean_gap > 0),
         g AS (
           SELECT least(8, overdue_ppm // 500000) AS bucket,
             count(*) AS n_users,
             min(overdue_ppm) AS min_overdue_ppm,
             max(overdue_ppm) AS max_overdue_ppm
           FROM o GROUP BY 1)
         SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(min_overdue_ppm AS BIGINT) AS min_overdue_ppm,
           CAST(max_overdue_ppm AS BIGINT) AS max_overdue_ppm,
           CAST(n_users * 1000000 // sum(n_users) OVER () AS BIGINT)
             AS share_ppm
         FROM g""")
}
