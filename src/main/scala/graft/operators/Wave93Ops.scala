package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 93: allocation advisors — UCB1 arm scoring over the
  * event "arms" (the exploration-bonus arithmetic done exactly: pinned
  * micro-nat ln, integer isqrt) and the catalog dead-stock report
  * (which parts never sold — the anti-join coverage audit purchasing
  * runs before every buy cycle).
  */
object Wave93Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q373: UCB1 arm advisor ------------------------------------------
    // Arms = event types; reward = value normalized to the corpus max
    // (ppm). UCB1 = mean_ppm + ⌊√(2·lnN_micro·1e6 div n)⌋ — the
    // exploration bonus in the same ppm scale, sqrt on an exact
    // integer < 2⁵³. The argmax arm is flagged via the struct-max
    // recipe. What a traffic allocator would pull next.
    "q373_ucb1_advisor" -> ((s, d) => {
      val mx = table(s, d, "events")
        .agg(max(expr("CAST(floor(value * 100) AS BIGINT)")).as("mc"),
          count(lit(1)).as("nn"))
      val arms = table(s, d, "events")
        .crossJoin(broadcast(mx))
        .select(col("event_type").as("arm"),
          expr("CAST(floor(value * 100) AS BIGINT) * 1000000 div mc")
            .as("r_ppm"),
          col("nn"))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_pulls"), sum("r_ppm").as("sr"),
          max("nn").as("nn"))
        .withColumn("mean_ppm", expr("sr div n_pulls"))
        .withColumn("bonus_ppm", expr(
          """CAST(floor(sqrt(CAST(
               (2 * CAST(floor(ln(1.0 * nn) * 1000000) AS BIGINT)
                * 1000000) div n_pulls AS DOUBLE))) AS BIGINT)"""))
        .withColumn("ucb_ppm", col("mean_ppm") + col("bonus_ppm"))
      arms
        .withColumn("best", max(struct(col("ucb_ppm"), col("arm")))
          .over(Window.partitionBy()))
        .select(col("arm"), col("n_pulls"), col("mean_ppm"),
          col("bonus_ppm"), col("ucb_ppm"),
          (col("ucb_ppm") === col("best.ucb_ppm") &&
            col("arm") === col("best.arm")).cast("long").as("chosen"))
    }),

    // ---- q374: catalog dead-stock report per brand ------------------------
    // Parts with ZERO sold lines (left anti join on the fact key) per
    // brand: count, ppm of the brand's catalog, and the brand's
    // revenue for contrast. Dimension-sized frames; the only big side
    // is the distinct fact key fold.
    "q374_dead_stock_report" -> ((s, d) => {
      val sold = table(s, d, "lineitem")
        .select(col("l_partkey").as("pk")).distinct()
      val parts = table(s, d, "part")
        .select(col("p_partkey").as("pk"), col("p_brand").as("brand"))
      val dead = parts.join(sold, Seq("pk"), "left_anti")
        .groupBy("brand").agg(count(lit(1)).as("dead_parts"))
      val rev = table(s, d, "lineitem")
        .join(parts, col("l_partkey") === col("pk"))
        .groupBy("brand")
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("rev_cents"))
      parts.groupBy("brand").agg(count(lit(1)).as("n_parts"))
        .join(dead, Seq("brand"), "left")
        .join(rev, Seq("brand"), "left")
        .na.fill(0L, Seq("dead_parts", "rev_cents"))
        .select(col("brand"), col("n_parts"), col("dead_parts"),
          expr("dead_parts * 1000000 div n_parts").as("dead_ppm"),
          col("rev_cents"))
    }))

  val oracle: Map[String, String] = Map(
    "q373_ucb1_advisor" ->
      """WITH mx AS (
           SELECT max(CAST(floor(value * 100) AS BIGINT)) AS mc,
             count(*) AS nn
           FROM events),
         arms AS (
           SELECT event_type AS arm, count(*) AS n_pulls,
             sum(CAST(floor(value * 100) AS BIGINT) * 1000000 // mc)
               AS sr,
             max(nn) AS nn
           FROM events, mx GROUP BY 1),
         scored AS (
           SELECT arm, n_pulls, sr // n_pulls AS mean_ppm,
             CAST(floor(sqrt(CAST(
               (2 * CAST(floor(ln(1.0 * nn) * 1000000) AS BIGINT)
                * 1000000) // n_pulls AS DOUBLE))) AS BIGINT)
               AS bonus_ppm
           FROM arms),
         u AS (
           SELECT *, mean_ppm + bonus_ppm AS ucb_ppm FROM scored),
         best AS (
           SELECT ucb_ppm AS b_ucb, arm AS b_arm FROM u
           ORDER BY ucb_ppm DESC, arm DESC LIMIT 1)
         SELECT arm, CAST(n_pulls AS BIGINT) AS n_pulls,
           CAST(mean_ppm AS BIGINT) AS mean_ppm,
           CAST(bonus_ppm AS BIGINT) AS bonus_ppm,
           CAST(ucb_ppm AS BIGINT) AS ucb_ppm,
           CAST(CASE WHEN ucb_ppm = b_ucb AND arm = b_arm
             THEN 1 ELSE 0 END AS BIGINT) AS chosen
         FROM u, best""",

    "q374_dead_stock_report" ->
      """WITH sold AS (SELECT DISTINCT l_partkey AS pk FROM lineitem),
         parts AS (SELECT p_partkey AS pk, p_brand AS brand FROM part),
         dead AS (
           SELECT brand, count(*) AS dead_parts
           FROM parts LEFT JOIN sold USING (pk)
           WHERE sold.pk IS NULL GROUP BY 1),
         rev AS (
           SELECT brand,
             sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS rev_cents
           FROM lineitem JOIN parts ON l_partkey = parts.pk
           GROUP BY 1),
         np AS (SELECT brand, count(*) AS n_parts
                FROM parts GROUP BY 1)
         SELECT np.brand, CAST(n_parts AS BIGINT) AS n_parts,
           CAST(coalesce(dead_parts, 0) AS BIGINT) AS dead_parts,
           CAST(coalesce(dead_parts, 0) * 1000000 // n_parts AS BIGINT)
             AS dead_ppm,
           CAST(coalesce(rev_cents, 0) AS BIGINT) AS rev_cents
         FROM np
         LEFT JOIN dead ON np.brand = dead.brand
         LEFT JOIN rev ON np.brand = rev.brand""")
}
