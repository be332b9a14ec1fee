package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 21: supervised-training data prep and release-time
  * distribution audits.
  *
  *   - q224 leave-one-out target encoding: the leakage-safe
  *     categorical encoder (each row's own label excluded from its
  *     category mean) in exact integer arithmetic.
  *   - q225 group-aware K-fold assignment + stratification audit:
  *     hash-of-user folds (a user can never straddle folds, by
  *     construction) with per-fold class-share ppm.
  *   - q226 distribution drift audit: first- vs second-half-month
  *     value histograms and per-bin chi-square contributions on ppm
  *     shares — the train/serve skew check a deployment runs.
  *   - q227 class-balanced downsampling plan: every label kept at
  *     exactly the minority-class count, chosen by deterministic hash
  *     rank, with an order-independent checksum of the kept set.
  */
object Wave21Ops {

  type Q = (SparkSession, String) => DataFrame

  /** 13-hex-digit md5 prefix as a BIGINT — the deterministic,
    * engine-portable hash used for fold/sample assignment (same
    * construction as q216/q200's splits). */
  private def h13(c: String): String =
    s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 13), 16, 10) AS BIGINT)"

  /** Mid-month cutoff (2024-01-16 00:00 UTC) splitting the events span
    * into the reference (A) and comparison (B) periods for q226. */
  private val CutSec = 1705363200L

  val queries: Map[String, Q] = Map(
    // ---- q224: leave-one-out target encoding ---------------------------
    // Per-category sums/counts once (map-side combined), broadcast back
    // (the category dimension is |event_type|-sized — at a
    // high-cardinality categorical the same two-pass plan hash-joins on
    // the category instead; never a per-row window over the corpus),
    // then enc_i = (Σcat − y_i) div (n−1) per row. value ≥ 0 in this
    // corpus so the numerator is non-negative and truncating `div` ==
    // floor division on both engines; a signed-label variant would ride
    // the wave-19 non-negativity shift. Excluding the row's own label
    // is what makes the encoding leakage-safe for training.
    "q224_loo_target_encoding" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_id"), col("event_type"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val stats = ev.groupBy("event_type")
        .agg(sum("cents").as("cat_sum"), count(lit(1)).as("cat_n"))
      ev.join(broadcast(stats), "event_type")
        .filter(col("cat_n") > 1)
        .select(col("event_id"), col("event_type"), col("cents"),
          expr("(cat_sum - cents) div (cat_n - 1)").as("loo_enc"))
    }),

    // ---- q225: group-aware K-fold + stratification audit ---------------
    // fold(user) = hash(user) mod 5: assignment is a pure map-side
    // function of the grouping key, so a user's events can NEVER leak
    // across folds — the invariant group K-fold exists to provide, here
    // by construction instead of by bookkeeping. The audit emits the
    // per-(fold, class) cell counts, distinct users, and within-fold
    // class share (integer ppm) — the stratification evidence a CV
    // setup reports. One (fold, class, user)-keyed aggregation.
    "q225_group_kfold" -> ((s, d) => {
      table(s, d, "events")
        .select(col("user_id"), col("event_type"))
        .withColumn("fold", expr(s"${h13("user_id")} % 5"))
        .groupBy("fold", "event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .withColumn("share_ppm", expr(
          "n_events * 1000000L div sum(n_events) over (partition by fold)"))
    }),

    // ---- q226: distribution drift audit (chi² on ppm shares) -----------
    // Ten fixed-width value bins sized from the global max (a 1-row
    // scalar broadcast), counts per bin for the first (A) and second
    // (B) half of the month, per-bin shares in integer ppm, and the
    // chi-square-style contribution (q−p)² div max(p,1) on the ppm
    // scale — integer end to end, so the drift report is engine-exact
    // (true χ² needs a float expected-count division; on ppm shares
    // the ranking and the alarm threshold carry the same information).
    // Bins materialize from sequence(0,9) and LEFT joins so empty bins
    // report 0s instead of vanishing. One scan + two 10-row aggs.
    "q226_drift_audit" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(expr("ts div 1000000000").as("sec"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val mx = ev.agg(max("cents").as("m"))
      val binned = ev.crossJoin(broadcast(mx))
        .select(expr("cents div (m div 10 + 1)").as("bin"), col("sec"))
      val a = binned.filter(col("sec") < CutSec)
        .groupBy("bin").agg(count(lit(1)).as("n_a"))
      val b = binned.filter(col("sec") >= CutSec)
        .groupBy("bin").agg(count(lit(1)).as("n_b"))
      val tots = binned.agg(
        sum(when(col("sec") < CutSec, 1L).otherwise(0L)).as("tot_a"),
        sum(when(col("sec") >= CutSec, 1L).otherwise(0L)).as("tot_b"))
      s.range(0, 10).select(col("id").as("bin"))
        .join(a, Seq("bin"), "left_outer")
        .join(b, Seq("bin"), "left_outer")
        .na.fill(0L, Seq("n_a", "n_b"))
        .crossJoin(broadcast(tots))
        .select(col("bin"), col("n_a"), col("n_b"),
          expr("n_a * 1000000L div tot_a").as("p_ppm"),
          expr("n_b * 1000000L div tot_b").as("q_ppm"))
        .withColumn("chi2_contrib",
          expr("(q_ppm - p_ppm) * (q_ppm - p_ppm) div greatest(p_ppm, 1L)"))
    }),

    // ---- q227: class-balanced downsampling plan ------------------------
    // Undersample every class to exactly the minority-class count,
    // members chosen by hash rank (hash ties broken by vec_id) — same
    // corpus in, same sample out, under any partitioning. The per-label
    // window sort keys the shuffle on the label; at 100 TB class sizes
    // the full sort gives way to the bottom-k-by-hash aggregator
    // (q184's BottomKSample) selecting the target-count smallest hashes
    // with O(k) state — identical sample by construction. kept_id_sum
    // is the order-independent checksum a downstream job re-verifies
    // the materialized sample against.
    "q227_class_balance" -> ((s, d) => {
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
        .withColumn("h", expr(h13("vec_id")))
      val target = e.groupBy("label").agg(count(lit(1)).as("n"))
        .agg(min("n").as("target"))
      val w = Window.partitionBy("label").orderBy(col("h"), col("vec_id"))
      e.withColumn("rk", row_number().over(w))
        .crossJoin(broadcast(target))
        .withColumn("kept", col("rk") <= col("target"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("vec_id"))).as("kept_id_sum"))
    }))

  val oracle: Map[String, String] = Map(
    "q224_loo_target_encoding" ->
      """WITH ev AS (
           SELECT event_id, event_type,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         stats AS (
           SELECT event_type, sum(cents) AS cat_sum, count(*) AS cat_n
           FROM ev GROUP BY 1)
         SELECT event_id, event_type, cents,
                CAST((cat_sum - cents) // (cat_n - 1) AS BIGINT) AS loo_enc
         FROM ev JOIN stats USING (event_type) WHERE cat_n > 1""",
    "q225_group_kfold" ->
      """WITH ev AS (
           SELECT user_id, event_type,
                  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                    1, 13)) AS BIGINT) % 5 AS fold
           FROM events),
         cell AS (
           SELECT fold, event_type, count(*) AS n_events,
                  count(DISTINCT user_id) AS n_users
           FROM ev GROUP BY 1, 2)
         SELECT fold, event_type, CAST(n_events AS BIGINT) AS n_events,
                CAST(n_users AS BIGINT) AS n_users,
                CAST(n_events * 1000000
                     // sum(n_events) OVER (PARTITION BY fold)
                  AS BIGINT) AS share_ppm
         FROM cell""",
    "q226_drift_audit" ->
      """WITH ev AS (
           SELECT epoch_ns(ts) // 1000000000 AS sec,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         mx AS (SELECT max(cents) AS m FROM ev),
         binned AS (
           SELECT cents // (m // 10 + 1) AS bin, sec FROM ev, mx),
         a AS (SELECT bin, count(*) AS n_a FROM binned
               WHERE sec < 1705363200 GROUP BY 1),
         b AS (SELECT bin, count(*) AS n_b FROM binned
               WHERE sec >= 1705363200 GROUP BY 1),
         tots AS (
           SELECT count(*) FILTER (WHERE sec < 1705363200) AS tot_a,
                  count(*) FILTER (WHERE sec >= 1705363200) AS tot_b
           FROM binned),
         shares AS (
           SELECT r.bin, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
                  coalesce(n_a, 0) * 1000000 // tot_a AS p_ppm,
                  coalesce(n_b, 0) * 1000000 // tot_b AS q_ppm
           FROM (SELECT unnest(range(10)) AS bin) r
           LEFT JOIN a ON a.bin = r.bin
           LEFT JOIN b ON b.bin = r.bin, tots)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(n_a AS BIGINT) AS n_a,
                CAST(n_b AS BIGINT) AS n_b,
                CAST(p_ppm AS BIGINT) AS p_ppm,
                CAST(q_ppm AS BIGINT) AS q_ppm,
                CAST((q_ppm - p_ppm) * (q_ppm - p_ppm)
                     // greatest(p_ppm, 1) AS BIGINT) AS chi2_contrib
         FROM shares""",
    "q227_class_balance" ->
      """WITH e AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                    1, 13)) AS BIGINT) AS h
           FROM embeddings),
         t AS (SELECT min(cnt) AS target FROM
                 (SELECT count(*) AS cnt FROM e GROUP BY label)),
         r AS (SELECT vec_id, label,
                      row_number() OVER (PARTITION BY label
                        ORDER BY h, vec_id) AS rk
               FROM e)
         SELECT label, CAST(count(*) AS BIGINT) AS n_total,
                CAST(sum(CASE WHEN rk <= (SELECT target FROM t)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(sum(CASE WHEN rk <= (SELECT target FROM t)
                         THEN vec_id END) AS BIGINT) AS kept_id_sum
         FROM r GROUP BY label""")
}
