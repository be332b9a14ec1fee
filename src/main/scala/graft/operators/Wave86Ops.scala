package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 86: the segment migration matrix — which spend
  * quintile did each user move to between the two halves of the
  * window (plus churned/new flows), with per-period EXACT quintile
  * cuts (the q326 inclusive-CDF histogram recipe; no ntile over the
  * user frame). The alluvial/Sankey feed of every retention review.
  */
object Wave86Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q359: spend-quintile migration matrix --------------------------
    // Presence = any event in the period; quintile scored 1..5 within
    // each period's own cuts (8 thresholds pivot into ONE broadcast
    // row), 0 = absent (new/churned flows). Output: ≤36 matrix cells
    // with user counts and corpus share ppm.
    "q359_segment_migration" -> ((s, d) => {
      val ev = table(s, d, "events")
      val bounds = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
      val per = ev.crossJoin(broadcast(bounds))
        .withColumn("late",
          expr("CAST(ts >= t0 + (t1 - t0) div 2 AS BIGINT)"))
        .groupBy("user_id", "late")
        .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("v"))
      val h = per.groupBy("late", "v").agg(count(lit(1)).as("c"))
      val cum = h.withColumn("cum", sum("c").over(
          Window.partitionBy("late").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(h.groupBy("late").agg(sum("c").as("n"))), "late")
      val thr = cum.crossJoin(
          broadcast(s.range(1, 5).select(col("id").as("j"))))
        .filter(col("cum") * 5 >= col("n") * col("j"))
        .groupBy("late", "j").agg(min("v").as("thr"))
        .groupBy()
        .pivot(concat(lit("p"), col("late"), lit("_"), col("j")),
          Seq("p0_1", "p0_2", "p0_3", "p0_4",
            "p1_1", "p1_2", "p1_3", "p1_4"))
        .agg(first("thr"))
      def score(v: String, p: String) = expr(
        s"""CASE WHEN $v IS NULL THEN 0 ELSE
            1 + CAST($v >= ${p}_1 AS BIGINT) +
            CAST($v >= ${p}_2 AS BIGINT) +
            CAST($v >= ${p}_3 AS BIGINT) +
            CAST($v >= ${p}_4 AS BIGINT) END""")
      val wide = per.groupBy("user_id")
        .agg(max(when(col("late") === 0, col("v"))).as("v0"),
          max(when(col("late") === 1, col("v"))).as("v1"))
      val scored = wide.crossJoin(broadcast(thr))
        .select(score("v0", "p0").as("q_from"),
          score("v1", "p1").as("q_to"))
      scored.groupBy("q_from", "q_to")
        .agg(count(lit(1)).as("n_users"))
        .withColumn("share_ppm",
          expr("n_users * 1000000 div sum(n_users) OVER ()"))
    }))

  val oracle: Map[String, String] = Map(
    "q359_segment_migration" ->
      """WITH b AS (
           SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
           FROM events),
         per AS (
           SELECT user_id,
             CASE WHEN epoch_ns(ts) >= t0 + (t1 - t0) // 2
               THEN 1 ELSE 0 END AS late,
             sum(CAST(floor(value * 100) AS BIGINT)) AS v
           FROM events, b GROUP BY 1, 2),
         h AS (SELECT late, v, count(*) AS c FROM per GROUP BY 1, 2),
         n AS (SELECT late, sum(c) AS n FROM h GROUP BY 1),
         cum AS (
           SELECT late, v,
             sum(c) OVER (PARTITION BY late ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM h),
         thr AS (
           SELECT cum.late, jj.j, min(cum.v) AS thr
           FROM cum JOIN n ON cum.late = n.late
           CROSS JOIN (SELECT unnest(range(1, 5)) AS j) jj
           WHERE cum.cum * 5 >= n.n * jj.j
           GROUP BY 1, 2),
         p AS (
           SELECT
             max(CASE WHEN late = 0 AND j = 1 THEN thr END) AS p0_1,
             max(CASE WHEN late = 0 AND j = 2 THEN thr END) AS p0_2,
             max(CASE WHEN late = 0 AND j = 3 THEN thr END) AS p0_3,
             max(CASE WHEN late = 0 AND j = 4 THEN thr END) AS p0_4,
             max(CASE WHEN late = 1 AND j = 1 THEN thr END) AS p1_1,
             max(CASE WHEN late = 1 AND j = 2 THEN thr END) AS p1_2,
             max(CASE WHEN late = 1 AND j = 3 THEN thr END) AS p1_3,
             max(CASE WHEN late = 1 AND j = 4 THEN thr END) AS p1_4
           FROM thr),
         wide AS (
           SELECT user_id,
             max(CASE WHEN late = 0 THEN v END) AS v0,
             max(CASE WHEN late = 1 THEN v END) AS v1
           FROM per GROUP BY 1),
         scored AS (
           SELECT
             CASE WHEN v0 IS NULL THEN 0 ELSE
               1 + CASE WHEN v0 >= p0_1 THEN 1 ELSE 0 END
                 + CASE WHEN v0 >= p0_2 THEN 1 ELSE 0 END
                 + CASE WHEN v0 >= p0_3 THEN 1 ELSE 0 END
                 + CASE WHEN v0 >= p0_4 THEN 1 ELSE 0 END END AS q_from,
             CASE WHEN v1 IS NULL THEN 0 ELSE
               1 + CASE WHEN v1 >= p1_1 THEN 1 ELSE 0 END
                 + CASE WHEN v1 >= p1_2 THEN 1 ELSE 0 END
                 + CASE WHEN v1 >= p1_3 THEN 1 ELSE 0 END
                 + CASE WHEN v1 >= p1_4 THEN 1 ELSE 0 END END AS q_to
           FROM wide, p),
         g AS (
           SELECT q_from, q_to, count(*) AS n_users
           FROM scored GROUP BY 1, 2)
         SELECT CAST(q_from AS BIGINT) AS q_from,
           CAST(q_to AS BIGINT) AS q_to,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_users * 1000000 // sum(n_users) OVER () AS BIGINT)
             AS share_ppm
         FROM g""")
}
