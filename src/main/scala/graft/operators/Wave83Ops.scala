package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 83: operational latency + load shapes — the
  * order→ship lag profile per priority class (exact mean/max/p50/p90
  * from a priority×lag-day histogram) and a sweep-line peak-concurrency
  * readout over 30-minute user sessions (the capacity-planning "how
  * many sessions were open at once" question, answered with ±1 deltas
  * and a running sum — never an interval×interval join).
  */
object Wave83Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q353: ship-lag profile per order priority ---------------------
    // lag = ship date − order date in whole days (integer, tz-free);
    // one fact pass folds to the (priority × lag) histogram, exact
    // p50/p90 via the inclusive-CDF rule per priority, mean in
    // micro-days. The SLA dashboard for a fulfillment pipeline.
    "q353_ship_lag_profile" -> ((s, d) => {
      val lag = table(s, d, "lineitem")
        .join(table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("prio"),
          expr("datediff(CAST(l_shipdate AS DATE), " +
            "CAST(o_orderdate AS DATE))").cast("long").as("lag"))
      val h = lag.groupBy("prio", "lag").agg(count(lit(1)).as("c"))
      val cum = h.withColumn("cum", sum("c").over(
          Window.partitionBy("prio").orderBy("lag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(h.groupBy("prio").agg(sum("c").as("n"),
          sum(expr("lag * c")).as("sl"), max("lag").as("mx"))), "prio")
      cum.groupBy("prio")
        .agg(max("n").as("n_lines"),
          expr("max(sl) * 1000000 div max(n)").as("mean_lag_micro"),
          max("mx").as("max_lag"),
          min(when(col("cum") * 2 >= col("n"), col("lag"))).as("p50"),
          min(when(col("cum") * 10 >= col("n") * 9, col("lag")))
            .as("p90"))
    }),

    // ---- q354: peak session concurrency per day ------------------------
    // Sessions = 30-min-gap sessionization per user (the corpus
    // convention); each session emits (+1 at start, −1 at end) deltas;
    // per day the running sum over (ts, delta, user) order — ends
    // sort before starts at the same instant, so back-to-back
    // sessions never double-count — peaks at the day's max
    // concurrency. The day-partitioned ordered window swaps for the
    // q93 two-phase prefix sum at real per-day volumes (documented);
    // midnight-crossing carry-over is defined away by the day scope
    // (sessions are gap-bounded minutes, documented).
    "q354_peak_concurrency" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapNs = 1800L * 1000000000L
      val sess = table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag("ts", 1).over(w))
        .withColumn("new_s",
          (col("prev").isNull || col("ts") - col("prev") > gapNs)
            .cast("long"))
        .withColumn("sid", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("t0"), max("ts").as("t1"))
      val deltas = sess.select(col("user_id"), col("t0").as("ts"),
          lit(1L).as("delta"))
        .unionByName(sess.select(col("user_id"),
          (col("t1") + 1).as("ts"), lit(-1L).as("delta")))
        .withColumn("day", expr("ts div 86400000000000"))
      deltas
        .withColumn("conc", sum("delta").over(
          Window.partitionBy("day").orderBy("ts", "delta", "user_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("day")
        .agg(max("conc").as("peak_concurrency"),
          sum(when(col("delta") === 1, 1L).otherwise(0L))
            .as("n_sessions"))
    }))

  val oracle: Map[String, String] = Map(
    "q353_ship_lag_profile" ->
      """WITH lag AS (
           SELECT o_orderpriority AS prio,
             CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
               AS BIGINT) AS lag
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         h AS (SELECT prio, lag, count(*) AS c FROM lag GROUP BY 1, 2),
         t AS (SELECT prio, sum(c) AS n, sum(lag * c) AS sl,
                 max(lag) AS mx
               FROM h GROUP BY 1),
         cum AS (
           SELECT h.prio, h.lag,
             sum(c) OVER (PARTITION BY h.prio ORDER BY h.lag
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM h)
         SELECT t.prio, CAST(t.n AS BIGINT) AS n_lines,
           CAST(t.sl * 1000000 // t.n AS BIGINT) AS mean_lag_micro,
           CAST(t.mx AS BIGINT) AS max_lag,
           CAST(min(CASE WHEN cum.cum * 2 >= t.n THEN cum.lag END)
             AS BIGINT) AS p50,
           CAST(min(CASE WHEN cum.cum * 10 >= t.n * 9 THEN cum.lag END)
             AS BIGINT) AS p90
         FROM cum JOIN t ON cum.prio = t.prio
         GROUP BY t.prio, t.n, t.sl, t.mx""",

    "q354_peak_concurrency" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) AS ts, event_id FROM events),
         flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > 1800000000000
               THEN 1 ELSE 0 END AS new_s
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sid AS (
           SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM flagged),
         sess AS (
           SELECT user_id, sid, min(ts) AS t0, max(ts) AS t1
           FROM sid GROUP BY 1, 2),
         deltas AS (
           SELECT user_id, t0 AS ts, 1 AS delta FROM sess
           UNION ALL SELECT user_id, t1 + 1, -1 FROM sess),
         dd AS (
           SELECT *, ts // 86400000000000 AS day FROM deltas),
         conc AS (
           SELECT day, delta,
             sum(delta) OVER (PARTITION BY day
               ORDER BY ts, delta, user_id
               ROWS UNBOUNDED PRECEDING) AS conc
           FROM dd)
         SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions
         FROM conc GROUP BY day""")
}
