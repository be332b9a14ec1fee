package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 74: serving-layer series shapes — M4 downsampling
  * (the error-free min/max/first/last-per-pixel-bucket aggregation a
  * time-series dashboard runs before plotting millions of points) and
  * first-touch→first-purchase conversion latency deciles (the q307
  * inclusive-CDF order statistic over a minute-bucketed latency
  * histogram).
  */
object Wave74Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q335: M4 downsampling to 100 pixel buckets --------------------
    // bucket = (ts−t0)·100 div span (integer, 0..99); per bucket the
    // M4 tuple (first, last, min, max of the value in cents) — first/
    // last via the exact (ts, event_id) struct order, so the whole
    // query is ONE combinable aggregate over the corpus (map-side
    // partials, no window, no sort): the downsampling shape that
    // preserves every line-rendering extreme pixel-exactly.
    "q335_m4_downsample" -> ((s, d) => {
      val b = table(s, d, "events")
        .agg(min("ts").as("t0"), max("ts").as("t1"))
      table(s, d, "events")
        .select(col("ts"), col("event_id"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("c"))
        .crossJoin(broadcast(b))
        .withColumn("bucket",
          expr("((ts - t0) * 100) div (t1 - t0 + 1)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("c").as("min_c"), max("c").as("max_c"),
          min(struct(col("ts"), col("event_id"), col("c"))).as("f"),
          max(struct(col("ts"), col("event_id"), col("c"))).as("l"))
        .select(col("bucket"), col("n"), col("min_c"), col("max_c"),
          col("f.c").as("first_c"), col("l.c").as("last_c"))
    }),

    // ---- q336: first-touch → first-purchase latency deciles ------------
    // Per user: first non-purchase event and first purchase; users
    // whose first purchase strictly follows their first touch yield a
    // minute-bucketed latency. Deciles via the q307 inclusive-CDF
    // order statistic on the latency histogram (domain-bounded:
    // minutes over the corpus span) — no corpus-sized sort. Counts of
    // converted / purchase-first / never-purchased users ride along on
    // every row (scalar broadcast) so the readout is self-describing.
    "q336_conversion_latency_deciles" -> ((s, d) => {
      val per = table(s, d, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") =!= "purchase", col("ts")))
            .as("t_touch"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("t_buy"))
      val classed = per.select(
        expr("""CASE
            WHEN t_buy IS NULL THEN 'no_purchase'
            WHEN t_touch IS NULL OR t_buy <= t_touch
              THEN 'purchase_first'
            ELSE 'converted' END""").as("cls"),
        expr("""CASE WHEN t_buy IS NOT NULL AND t_touch IS NOT NULL
            AND t_buy > t_touch
            THEN (t_buy - t_touch) div 60000000000 END""").as("lat_min"))
      val counts = classed.groupBy()
        .pivot("cls", Seq("converted", "purchase_first", "no_purchase"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("converted").as("n_converted"),
          col("purchase_first").as("n_purchase_first"),
          col("no_purchase").as("n_no_purchase"))
      val h = classed.filter(col("cls") === "converted")
        .groupBy("lat_min").agg(count(lit(1)).as("c"))
      val cum = h.withColumn("cum", sum("c").over(
          Window.orderBy("lat_min")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(h.agg(sum("c").as("n_conv"))))
      cum.crossJoin(
          broadcast(s.range(1, 10).select(col("id").as("decile"))))
        .filter(col("cum") * 10 >= col("n_conv") * col("decile"))
        .groupBy("decile").agg(min("lat_min").as("q_minutes"))
        .crossJoin(broadcast(counts))
    }))

  val oracle: Map[String, String] = Map(
    "q335_m4_downsample" ->
      """WITH b AS (
           SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
           FROM events),
         x AS (
           SELECT ((epoch_ns(ts) - t0) * 100) // (t1 - t0 + 1)
               AS bucket,
             epoch_ns(ts) AS ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS c
           FROM events, b),
         r AS (
           SELECT *,
             row_number() OVER (PARTITION BY bucket
               ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY bucket
               ORDER BY ts DESC, event_id DESC) AS rn_d
           FROM x)
         SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(min(c) AS BIGINT) AS min_c,
           CAST(max(c) AS BIGINT) AS max_c,
           CAST(max(CASE WHEN rn_a = 1 THEN c END) AS BIGINT)
             AS first_c,
           CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT)
             AS last_c
         FROM r GROUP BY bucket""",

    "q336_conversion_latency_deciles" ->
      """WITH per AS (
           SELECT user_id,
             min(CASE WHEN event_type <> 'purchase'
               THEN epoch_ns(ts) END) AS t_touch,
             min(CASE WHEN event_type = 'purchase'
               THEN epoch_ns(ts) END) AS t_buy
           FROM events GROUP BY 1),
         classed AS (
           SELECT
             CASE WHEN t_buy IS NULL THEN 'no_purchase'
                  WHEN t_touch IS NULL OR t_buy <= t_touch
                    THEN 'purchase_first'
                  ELSE 'converted' END AS cls,
             CASE WHEN t_buy IS NOT NULL AND t_touch IS NOT NULL
                 AND t_buy > t_touch
               THEN (t_buy - t_touch) // 60000000000 END AS lat_min
           FROM per),
         counts AS (
           SELECT
             sum(CASE WHEN cls = 'converted' THEN 1 ELSE 0 END)
               AS n_converted,
             sum(CASE WHEN cls = 'purchase_first' THEN 1 ELSE 0 END)
               AS n_purchase_first,
             sum(CASE WHEN cls = 'no_purchase' THEN 1 ELSE 0 END)
               AS n_no_purchase
           FROM classed),
         h AS (
           SELECT lat_min, count(*) AS c FROM classed
           WHERE cls = 'converted' GROUP BY 1),
         cum AS (
           SELECT lat_min,
             sum(c) OVER (ORDER BY lat_min ROWS UNBOUNDED PRECEDING)
               AS cum
           FROM h),
         nc AS (SELECT sum(c) AS n_conv FROM h),
         dec AS (
           SELECT dd.decile, min(cum.lat_min) AS q_minutes
           FROM cum, nc,
             (SELECT unnest(range(1, 10)) AS decile) dd
           WHERE cum.cum * 10 >= nc.n_conv * dd.decile
           GROUP BY 1)
         SELECT CAST(decile AS BIGINT) AS decile,
           CAST(q_minutes AS BIGINT) AS q_minutes,
           CAST(n_converted AS BIGINT) AS n_converted,
           CAST(n_purchase_first AS BIGINT) AS n_purchase_first,
           CAST(n_no_purchase AS BIGINT) AS n_no_purchase
         FROM dec, counts""")
}
