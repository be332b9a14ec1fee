package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 65: temporal-shape monitors — burst detection over the
  * hourly event stream and a seasonal (day-of-week) decomposition with
  * anomaly flagging over the daily revenue series. Both reduce the
  * corpus to a domain-bounded time frame (hours / days) in ONE pass,
  * then run their window logic on that frame — the windows are never
  * corpus-sized, so the shapes hold at any event volume.
  */
object Wave65Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q317: trailing-baseline burst detection -----------------------
    // Events fold to hour buckets (pure integer ts arithmetic on the
    // canonical ns column); a bucket bursts when its count exceeds 2×
    // the trailing 24-bucket mean, i.e. cnt·24 > 2·trail_sum in exact
    // integers. Only buckets with a FULL trailing window qualify (no
    // partial-baseline false positives at the series head). The
    // ordered window runs on the hour frame — bounded by the corpus
    // time span, not its row count.
    "q317_burst_detection" -> ((s, d) => {
      val hourly = table(s, d, "events")
        .groupBy(expr("ts div 3600000000000").as("hour_id"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy("hour_id").rowsBetween(-24, -1)
      hourly
        .withColumn("trail_sum", sum("cnt").over(w))
        .withColumn("trail_n", count(lit(1)).over(w))
        .filter(col("trail_n") === 24 &&
          col("cnt") * 24 > col("trail_sum") * 2)
        .select(col("hour_id"), col("cnt"), col("trail_sum"),
          expr("(cnt * 24 * 1000000) div trail_sum").as("ratio_ppm"))
    }),

    // ---- q318: day-of-week decomposition + anomaly days ----------------
    // Daily revenue → centered 7-row moving average (full windows
    // only) → detrended residual → day-of-week effect (Sunday=0
    // convention pinned in both engines) → per-day remainder. Days
    // whose |remainder| exceeds 3× the mean absolute deviation are
    // the anomalies. Every statistic is exact-integer (div at each
    // defined step, identically in both engines); the dow frame is 7
    // rows and the MAD a single scalar, both broadcast.
    "q318_seasonal_anomaly_days" -> ((s, d) => {
      val daily = table(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val w = Window.orderBy("day").rowsBetween(-3, 3)
      val det = daily
        .withColumn("ma_sum", sum("cents").over(w))
        .withColumn("ma_n", count(lit(1)).over(w))
        .filter(col("ma_n") === 7)
        .withColumn("ma7", expr("ma_sum div 7"))
        .withColumn("det", col("cents") - col("ma7"))
        .withColumn("dow",
          (dayofweek(to_date(col("day"))) - 1).cast("long"))
      val dowEff = det.groupBy("dow")
        .agg(expr("sum(det) div count(1)").as("dow_eff"))
      val withResid = det.join(broadcast(dowEff), "dow")
        .withColumn("resid", col("det") - col("dow_eff"))
      val mad = withResid
        .agg(expr("sum(abs(resid)) div count(1)").as("mad"))
      withResid.crossJoin(broadcast(mad))
        .filter(abs(col("resid")) > col("mad") * 3)
        .select(col("day"), col("cents"), col("ma7"), col("dow"),
          col("dow_eff"), col("resid"))
    }))

  val oracle: Map[String, String] = Map(
    "q317_burst_detection" ->
      """WITH hourly AS (
           SELECT epoch_ns(ts) // 3600000000000 AS hour_id,
             count(*) AS cnt
           FROM events GROUP BY 1),
         trail AS (
           SELECT hour_id, cnt,
             sum(cnt) OVER (ORDER BY hour_id
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_sum,
             count(*) OVER (ORDER BY hour_id
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_n
           FROM hourly)
         SELECT hour_id, CAST(cnt AS BIGINT) AS cnt,
           CAST(trail_sum AS BIGINT) AS trail_sum,
           CAST((cnt * 24 * 1000000) // trail_sum AS BIGINT) AS ratio_ppm
         FROM trail
         WHERE trail_n = 24 AND cnt * 24 > trail_sum * 2""",

    "q318_seasonal_anomaly_days" ->
      """WITH daily AS (
           SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1),
         ma AS (
           SELECT day, cents,
             sum(cents) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ma_sum,
             count(*) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ma_n
           FROM daily),
         det AS (
           SELECT day, cents, ma_sum // 7 AS ma7,
             cents - ma_sum // 7 AS det,
             CAST(strftime(CAST(day AS DATE), '%w') AS BIGINT) AS dow
           FROM ma WHERE ma_n = 7),
         eff AS (
           SELECT dow, sum(det) // count(*) AS dow_eff
           FROM det GROUP BY 1),
         resid AS (
           SELECT det.day, det.cents, det.ma7, det.dow, eff.dow_eff,
             det.det - eff.dow_eff AS resid
           FROM det JOIN eff ON det.dow = eff.dow),
         mad AS (SELECT sum(abs(resid)) // count(*) AS mad FROM resid)
         SELECT day, CAST(cents AS BIGINT) AS cents,
           CAST(ma7 AS BIGINT) AS ma7, dow,
           CAST(dow_eff AS BIGINT) AS dow_eff,
           CAST(resid AS BIGINT) AS resid
         FROM resid, mad
         WHERE abs(resid) > mad * 3""")
}
