package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 34: monitoring / optimizer-statistics / sequence-mining.
  *
  *   - q250 CUSUM change-point detection on the per-type daily revenue
  *     series — the classic page-level drift detector, integer-exact.
  *   - q251 join-cardinality estimation audit: the System-R uniformity
  *     estimate vs the histogram-exact actual, computed WITHOUT ever
  *     materializing the join — the statistics pass a cost-based
  *     optimizer (or a 100 TB join pre-flight) runs.
  *   - q252 sequential rule mining: contiguous event 3-gram support and
  *     rule confidence ("a then b → c"), the PrefixSpan-lite order-2
  *     extension of q133's first-order transition matrix.
  */
object Wave34Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q250: CUSUM change-point per event_type -----------------------
    // Daily cents sums roll the corpus up to (type × day) rows FIRST —
    // the cumulative window then partitions by type over a frame whose
    // size is bounded by the calendar, not the corpus, so no
    // corpus-sized SinglePartition window exists at any scale. The
    // deviation is cross-multiplied (n·y_d − S) to stay integer-exact:
    // it is n·(y_d − mean), so the running sum is the CUSUM statistic
    // scaled by the constant n, and its argmax day is the change point
    // (CUSUM telescopes to 0 at the last day by construction). Per-type
    // stats are a types-row frame → broadcast join.
    "q250_cusum_changepoint" -> ((s, d) => {
      val daily = table(s, d, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("y").as("s_tot"))
      val wCum = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = daily.join(broadcast(stats), "event_type")
        .withColumn("c", sum(expr("y * n_days - s_tot")).over(wCum))
      val wPick = Window.partitionBy("event_type")
        .orderBy(abs(col("c")).desc, col("day"))
      cum.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day").as("change_day"),
          col("n_days"), col("c").as("peak_cusum"))
    }),

    // ---- q251: join-cardinality estimation audit -----------------------
    // For three join shapes (FK, skewed self-join, many-to-many), the
    // System-R estimate |L|·|R| / max(ndv_L, ndv_R) is audited against
    // the exact output cardinality Σ_k c_L(k)·c_R(k) — computed from the
    // two per-key COUNT histograms joined on the key, so the join whose
    // size is being estimated is NEVER materialized (the events
    // self-join would be ~10^7 rows at sf0.1 and unbounded at corpus
    // scale; its histogram is |users| rows). Each audit is two
    // map-side-combined histogram shuffles + one key-equi histogram
    // join; the 1-row side/actual aggregates are documented scalar
    // broadcasts. The FK rows come out at ratio 1.000000 by
    // construction; the self-join row quantifies how far key skew drags
    // the uniformity estimate below reality — exactly the signal a
    // cost-based reorder (or a salting pre-flight) needs. 64-bit note:
    // n_left·n_right overflows long only past ~3·10^9 rows per side;
    // at that scale the inputs to this audit are themselves sketches
    // (q165's KMV set algebra), not exact counts.
    "q251_join_size_audit" -> ((s, d) => {
      def audit(name: String, l: DataFrame, lk: String,
          r: DataFrame, rk: String): DataFrame = {
        val hl = l.groupBy(col(lk).as("k")).agg(count(lit(1)).as("cl"))
        val hr = r.groupBy(col(rk).as("k")).agg(count(lit(1)).as("cr"))
        val sl = hl.agg(sum("cl").as("n_left"),
          count(lit(1)).as("ndv_left"))
        val sr = hr.agg(sum("cr").as("n_right"),
          count(lit(1)).as("ndv_right"))
        val act = hl.join(hr, "k")
          .agg(coalesce(sum(expr("cl * cr")), lit(0L)).as("actual_rows"))
        sl.crossJoin(sr).crossJoin(act)
          .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
            greatest(col("ndv_left"), col("ndv_right")).as("ndv_max"),
            expr("n_left * n_right div greatest(ndv_left, ndv_right)")
              .as("est_rows"),
            col("actual_rows"),
            expr("""(n_left * n_right
                     div greatest(ndv_left, ndv_right)) * 1000000
                    div actual_rows""").as("est_over_actual_ppm"))
      }
      val ev = table(s, d, "events")
      audit("orders_customer", table(s, d, "orders"), "o_custkey",
          table(s, d, "customer"), "c_custkey")
        .unionByName(audit("events_self_user", ev, "user_id", ev, "user_id"))
        .unionByName(audit("customer_supplier_nation",
          table(s, d, "customer"), "c_nationkey",
          table(s, d, "supplier"), "s_nationkey"))
    }),

    // ---- q252: sequential rules (3-gram support + confidence) ----------
    // ONE user-keyed window shuffle (co-partitioned with every other
    // per-user stage) produces both lookahead columns; the (a,b,c)
    // rollup — |types|²·(|types|+1) rows at most — carries the 2-gram
    // occurrence totals as a window over that tiny frame (c IS NULL
    // rows exist precisely to complete n_ab without a second corpus
    // pass). Support is distinct users, confidence is occurrences of
    // a>b>c over occurrences of a>b in ppm — the sequence-rule version
    // of association confidence.
    "q252_seq_rules" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val seq = table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("a"))
        .withColumn("b", lead(col("a"), 1).over(w))
        .withColumn("c", lead(col("a"), 2).over(w))
      val g = seq.filter(col("b").isNotNull)
        .groupBy("a", "b", "c")
        .agg(count(lit(1)).as("n_occ"),
          countDistinct("user_id").as("n_users"))
      val wAb = Window.partitionBy("a", "b")
      g.withColumn("n_ab", sum("n_occ").over(wAb))
        .filter(col("c").isNotNull)
        .select(concat_ws(">", col("a"), col("b"), col("c")).as("pattern"),
          col("n_users"), col("n_occ"),
          expr("n_occ * 1000000 div n_ab").as("conf_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q250_cusum_changepoint" ->
      """WITH daily AS (
           SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT event_type, count(*) AS n_days,
             CAST(sum(y) AS BIGINT) AS s_tot
           FROM daily GROUP BY 1),
         cum AS (
           SELECT d.event_type, d.day, st.n_days,
             CAST(sum(d.y * st.n_days - st.s_tot) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS c
           FROM daily d JOIN st USING (event_type)),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY abs(c) DESC, day) AS rn
           FROM cum)
         SELECT event_type, day AS change_day, n_days, c AS peak_cusum
         FROM r WHERE rn = 1""",

    "q251_join_size_audit" ->
      """WITH h1l AS (SELECT o_custkey AS k, count(*) AS c
                      FROM orders GROUP BY 1),
         h1r AS (SELECT c_custkey AS k, count(*) AS c
                 FROM customer GROUP BY 1),
         h2 AS (SELECT user_id AS k, count(*) AS c
                FROM events GROUP BY 1),
         h3l AS (SELECT c_nationkey AS k, count(*) AS c
                 FROM customer GROUP BY 1),
         h3r AS (SELECT s_nationkey AS k, count(*) AS c
                 FROM supplier GROUP BY 1),
         a AS (
           SELECT 'orders_customer' AS join_name,
             (SELECT CAST(sum(c) AS BIGINT) FROM h1l) AS n_left,
             (SELECT CAST(sum(c) AS BIGINT) FROM h1r) AS n_right,
             greatest((SELECT count(*) FROM h1l),
                      (SELECT count(*) FROM h1r)) AS ndv_max,
             (SELECT CAST(sum(l.c * r.c) AS BIGINT)
              FROM h1l l JOIN h1r r USING (k)) AS actual_rows
           UNION ALL
           SELECT 'events_self_user',
             (SELECT CAST(sum(c) AS BIGINT) FROM h2),
             (SELECT CAST(sum(c) AS BIGINT) FROM h2),
             (SELECT count(*) FROM h2),
             (SELECT CAST(sum(l.c * r.c) AS BIGINT)
              FROM h2 l JOIN h2 r USING (k))
           UNION ALL
           SELECT 'customer_supplier_nation',
             (SELECT CAST(sum(c) AS BIGINT) FROM h3l),
             (SELECT CAST(sum(c) AS BIGINT) FROM h3r),
             greatest((SELECT count(*) FROM h3l),
                      (SELECT count(*) FROM h3r)),
             (SELECT CAST(sum(l.c * r.c) AS BIGINT)
              FROM h3l l JOIN h3r r USING (k)))
         SELECT join_name, n_left, n_right, CAST(ndv_max AS BIGINT) AS ndv_max,
           n_left * n_right // ndv_max AS est_rows, actual_rows,
           (n_left * n_right // ndv_max) * 1000000 // actual_rows
             AS est_over_actual_ppm
         FROM a""",

    "q252_seq_rules" ->
      """WITH seq AS (
           SELECT user_id, event_type AS a,
             lead(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS b,
             lead(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS c
           FROM events),
         g AS (
           SELECT a, b, c, count(*) AS n_occ,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           FROM seq WHERE b IS NOT NULL GROUP BY 1, 2, 3),
         t AS (
           SELECT *, CAST(sum(n_occ) OVER (PARTITION BY a, b) AS BIGINT)
             AS n_ab
           FROM g)
         SELECT a || '>' || b || '>' || c AS pattern, n_users, n_occ,
           (n_occ * 1000000) // n_ab AS conf_ppm
         FROM t WHERE c IS NOT NULL""")
}
