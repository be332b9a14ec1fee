package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 77: causal-inference estimators beyond the randomized
  * readouts (q305/q309) — difference-in-differences over the 2×2
  * arm×period grid, and a nearest-neighbor MATCHING estimator (each
  * treated user matched to the control with the closest pre-period
  * spend via one sorted scan — no all-pairs distance stage).
  */
object Wave77Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Per-user (pre, post) spend cents + parity arm — the q309 frame. */
  private def userFrame(s: SparkSession, d: String): DataFrame = {
    val ev = table(s, d, "events")
    val bounds = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("late",
        expr("CAST(ts >= t0 + (t1 - t0) div 2 AS BIGINT)"))
      .groupBy("user_id")
      .agg(
        sum(expr("(1 - late) * CAST(floor(value * 100) AS BIGINT)"))
          .as("x"),
        sum(expr("late * CAST(floor(value * 100) AS BIGINT)")).as("y"))
      .withColumn("t", expr("user_id % 2"))
  }

  val queries: Map[String, Q] = Map(
    // ---- q341: difference-in-differences -------------------------------
    // Cells = arm × period; each cell mean is per-user (arm-sized
    // denominator, micro-cents, one truncating division); DiD =
    // (treated post−pre) − (control post−pre). One user-frame pass,
    // then pure scalar arithmetic on the 1-row moment frame. The
    // parallel-trends readout that the randomized diff (q309) doesn't
    // need but every observational rollout does.
    "q341_did_estimate" -> ((s, d) => {
      userFrame(s, d)
        .groupBy()
        .agg(
          sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_t"),
          sum(when(col("t") === 0, 1L).otherwise(0L)).as("n_c"),
          sum(when(col("t") === 1, col("x")).otherwise(0L)).as("sxt"),
          sum(when(col("t") === 1, col("y")).otherwise(0L)).as("syt"),
          sum(when(col("t") === 0, col("x")).otherwise(0L)).as("sxc"),
          sum(when(col("t") === 0, col("y")).otherwise(0L)).as("syc"))
        .select(col("n_t"), col("n_c"),
          expr("sxt * 1000000 div n_t").as("pre_t_micro"),
          expr("syt * 1000000 div n_t").as("post_t_micro"),
          expr("sxc * 1000000 div n_c").as("pre_c_micro"),
          expr("syc * 1000000 div n_c").as("post_c_micro"),
          expr("""(syt * 1000000 div n_t - sxt * 1000000 div n_t)
              - (syc * 1000000 div n_c - sxc * 1000000 div n_c)""")
            .as("did_micro"))
    }),

    // ---- q342: nearest-neighbor matching ATT ---------------------------
    // Sort treated and control users together by pre-spend; each
    // treated row reads its backward (last control at x ≤ x_t,
    // equal-x controls sort before treated; max-uid tie) and forward
    // (first control at x > x_t; min-uid tie) neighbors — the
    // sorted-scan form of nearest-neighbor matching, O(n log n) not
    // O(n²). The closer side wins (tie → backward). ATT = mean
    // treated-minus-matched post spend; the mean match gap rides along
    // as the match-quality readout. The neighbor reads run through
    // [[OrderedScan.neighborScan]] — the two-phase range-partitioned
    // scan (round-7's sf1 run measured the previous single global
    // Window.orderBy at 24.4× for 10× data: the whole user frame
    // funnelled through one task); now every stage is n/P-bounded and
    // the hash is unchanged.
    "q342_matching_att" -> ((s, d) => {
      val u = userFrame(s, d)
        .select(col("user_id").as("uid"), col("x"), col("y"), col("t"))
      val control = when(col("t") === 0,
        struct(col("x").as("cx"), col("y").as("cy")))
      val matched = OrderedScan
        .neighborScan(u, Seq("x", "t", "uid"), control, "_b", "_f")
        .withColumn("bx", col("_b.cx"))
        .withColumn("by", col("_b.cy"))
        .withColumn("fx", col("_f.cx"))
        .withColumn("fy", col("_f.cy"))
        .filter(col("t") === 1)
        .withColumn("useB", expr(
          """CASE WHEN bx IS NULL THEN false
                  WHEN fx IS NULL THEN true
                  ELSE x - bx <= fx - x END"""))
        .select(col("x"), col("y"),
          when(col("useB"), col("by")).otherwise(col("fy")).as("my"),
          when(col("useB"), col("x") - col("bx"))
            .otherwise(col("fx") - col("x")).as("gap"))
        .filter(col("my").isNotNull)
      val nC = u.filter(col("t") === 0)
        .agg(count(lit(1)).as("n_control"))
      matched
        .agg(count(lit(1)).as("n_matched"),
          sum(expr("y - my")).as("sd"), sum("gap").as("sg"))
        .crossJoin(broadcast(nC))
        .select(col("n_matched"), col("n_control"),
          expr("sd * 1000000 div n_matched").as("att_micro"),
          expr("sg * 1000000 div n_matched").as("avg_gap_micro"))
    }))

  val oracle: Map[String, String] = Map(
    "q341_did_estimate" ->
      """WITH b AS (
           SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
           FROM events),
         u AS (
           SELECT user_id,
             sum(CASE WHEN epoch_ns(ts) < t0 + (t1 - t0) // 2
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS x,
             sum(CASE WHEN epoch_ns(ts) >= t0 + (t1 - t0) // 2
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS y,
             user_id % 2 AS t
           FROM events, b GROUP BY user_id),
         m AS (
           SELECT
             sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n_t,
             sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n_c,
             sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS sxt,
             sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS syt,
             sum(CASE WHEN t = 0 THEN x ELSE 0 END) AS sxc,
             sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS syc
           FROM u)
         SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
           CAST(sxt * 1000000 // n_t AS BIGINT) AS pre_t_micro,
           CAST(syt * 1000000 // n_t AS BIGINT) AS post_t_micro,
           CAST(sxc * 1000000 // n_c AS BIGINT) AS pre_c_micro,
           CAST(syc * 1000000 // n_c AS BIGINT) AS post_c_micro,
           CAST((syt * 1000000 // n_t - sxt * 1000000 // n_t)
             - (syc * 1000000 // n_c - sxc * 1000000 // n_c) AS BIGINT)
             AS did_micro
         FROM m""",

    "q342_matching_att" ->
      """WITH b AS (
           SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
           FROM events),
         u AS (
           SELECT user_id AS uid,
             sum(CASE WHEN epoch_ns(ts) < t0 + (t1 - t0) // 2
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS x,
             sum(CASE WHEN epoch_ns(ts) >= t0 + (t1 - t0) // 2
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS y,
             user_id % 2 AS t
           FROM events, b GROUP BY user_id),
         w AS (
           SELECT *,
             last_value(CASE WHEN t = 0 THEN x END IGNORE NULLS)
               OVER bw AS bx,
             last_value(CASE WHEN t = 0 THEN y END IGNORE NULLS)
               OVER bw AS by,
             first_value(CASE WHEN t = 0 THEN x END IGNORE NULLS)
               OVER fw AS fx,
             first_value(CASE WHEN t = 0 THEN y END IGNORE NULLS)
               OVER fw AS fy
           FROM u
           WINDOW
             bw AS (ORDER BY x, t, uid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fw AS (ORDER BY x, t, uid
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
         matched AS (
           SELECT x, y,
             CASE WHEN (bx IS NOT NULL AND fx IS NULL)
                    OR (bx IS NOT NULL AND x - bx <= fx - x)
               THEN by ELSE fy END AS my,
             CASE WHEN (bx IS NOT NULL AND fx IS NULL)
                    OR (bx IS NOT NULL AND x - bx <= fx - x)
               THEN x - bx ELSE fx - x END AS gap
           FROM w WHERE t = 1),
         agg AS (
           SELECT count(*) AS n_matched, sum(y - my) AS sd,
             sum(gap) AS sg
           FROM matched WHERE my IS NOT NULL),
         nc AS (SELECT count(*) AS n_control FROM u WHERE t = 0)
         SELECT CAST(n_matched AS BIGINT) AS n_matched,
           CAST(n_control AS BIGINT) AS n_control,
           CAST(sd * 1000000 // n_matched AS BIGINT) AS att_micro,
           CAST(sg * 1000000 // n_matched AS BIGINT) AS avg_gap_micro
         FROM agg, nc""")
}
