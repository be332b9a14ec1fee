package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 55: operational planning advisors — the two numbers a
  * pipeline engineer actually sets by hand today.
  *
  *   - q298 skew-salt advisor: per heavy join/group key, the salt
  *     factor that levels it to the per-partition target (the q57/q156
  *     salting machinery decides HOW; this decides WHICH keys and BY
  *     HOW MUCH).
  *   - q299 session-gap sizing advisor: exact quantiles of the
  *     per-user inter-event gap distribution → the gap parameter the
  *     sessionizers (q29, q67) should carry. (A watermark advisor was
  *     considered and rejected: this corpus's arrival order is exactly
  *     its event-time order — q154 measures zero lateness — so the
  *     gap distribution is the sizing decision with real signal.)
  */
object Wave55Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q298: skew-salt advisor ---------------------------------------
    // Two candidate key columns stacked map-side; per key: rows, share
    // in ppm, and — for keys exceeding 2× the per-partition target at
    // the pinned parallelism (32, the session's shuffle width) — the
    // salt factor ⌈n/target⌉ and the post-salt share. One histogram
    // shuffle per stack (map-side combined, key-domain-bounded output);
    // at any scale the advisor's cost is the scan.
    "q298_salt_advisor" -> ((s, d) => {
      val keys = table(s, d, "events")
        .select(lit("events.event_type").as("key_col"),
          col("event_type").as("key"))
        .unionByName(table(s, d, "orders")
          .select(lit("orders.o_orderpriority").as("key_col"),
            col("o_orderpriority").as("key")))
      val counts = keys.groupBy("key_col", "key")
        .agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("key_col").agg(sum("n").as("nt"))
      counts.join(broadcast(tot), "key_col")
        .withColumn("target", expr("nt div 32 + 1"))
        .filter(col("n") > lit(2) * col("target"))
        .select(col("key_col"), col("key"), col("n"),
          expr("n * 1000000 div nt").as("share_ppm"),
          expr("(n + target - 1) div target").as("salt_factor"),
          expr("(n * 1000000 div nt) div ((n + target - 1) div target)")
            .as("post_salt_share_ppm"))
    }),

    // ---- q299: session-gap sizing advisor ------------------------------
    // The gap parameter a sessionizer (q29, q67's session windows)
    // carries is set from the per-user inter-event gap distribution:
    // exact p50/p90/p99/max in integer seconds via the domain-bounded
    // histogram + cumulative window (the q181/q285 order-statistic
    // discipline — the window runs over distinct gap values, never
    // rows; per-user lead keeps the first window partition-bounded).
    // The advisory row is the p90 rounded UP to the next minute: gaps
    // above it are "session breaks" for ~10% of adjacent pairs — the
    // usual starting calibration. Driver state is 5 scalar actions.
    "q299_session_gap_advisor" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = table(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("nxt", lead("ts", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(expr("(nxt - ts) div 1000000000").as("gap_s"))
      val n = gaps.agg(count(lit(1)).as("n"))
      val cw = Window.orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // persisted: three percentile probes + max + count hit this
      // domain-bounded frame; without the cache each scalar action
      // re-runs the per-user window over the corpus.
      val hist = gaps.groupBy("gap_s").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(cw))
        .crossJoin(broadcast(n))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def pct(p: Int) = hist
        .filter(col("cum") * 100 >= col("n") * p)
        .agg(min("gap_s")).head().getLong(0)
      val p50 = pct(50); val p90 = pct(90); val p99 = pct(99)
      // max and count come from the cached histogram, not fresh
      // corpus passes
      val mx = hist.agg(max("gap_s")).head().getLong(0)
      val nl = hist.agg(max("n")).head().getLong(0)
      import s.implicits._
      Seq(("p50_s", p50), ("p90_s", p90), ("p99_s", p99), ("max_s", mx),
        ("n_gaps", nl),
        ("advised_gap_s", (p90 + 59) / 60 * 60))
        .toDF("stat", "value_s")
    }))

  val oracle: Map[String, String] = Map(
    "q298_salt_advisor" ->
      """WITH keys AS (
           SELECT 'events.event_type' AS key_col, event_type AS key
           FROM events
           UNION ALL
           SELECT 'orders.o_orderpriority', o_orderpriority FROM orders),
         counts AS (
           SELECT key_col, key, count(*) AS n FROM keys GROUP BY 1, 2),
         tot AS (SELECT key_col, sum(n) AS nt FROM counts GROUP BY 1)
         SELECT c.key_col, c.key, CAST(c.n AS BIGINT) AS n,
           CAST(c.n * 1000000 // t.nt AS BIGINT) AS share_ppm,
           CAST((c.n + t.nt // 32 + 1 - 1) // (t.nt // 32 + 1)
             AS BIGINT) AS salt_factor,
           CAST((c.n * 1000000 // t.nt)
                // ((c.n + t.nt // 32 + 1 - 1) // (t.nt // 32 + 1))
             AS BIGINT) AS post_salt_share_ppm
         FROM counts c JOIN tot t ON c.key_col = t.key_col
         WHERE c.n > 2 * (t.nt // 32 + 1)""",

    "q299_session_gap_advisor" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ns(ts) AS ts FROM events),
         g AS (
           SELECT (nxt - ts) // 1000000000 AS gap_s FROM (
             SELECT ts, lead(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
             FROM e)
           WHERE nxt IS NOT NULL),
         n AS (SELECT count(*) AS n FROM g),
         hist AS (
           SELECT gap_s, sum(count(*)) OVER (ORDER BY gap_s
             ROWS UNBOUNDED PRECEDING) AS cum
           FROM g GROUP BY gap_s),
         p AS (
           SELECT
             (SELECT min(gap_s) FROM hist, n WHERE cum * 100 >= n * 50)
               AS p50,
             (SELECT min(gap_s) FROM hist, n WHERE cum * 100 >= n * 90)
               AS p90,
             (SELECT min(gap_s) FROM hist, n WHERE cum * 100 >= n * 99)
               AS p99,
             (SELECT max(gap_s) FROM g) AS mx,
             (SELECT n FROM n) AS nl)
         SELECT 'p50_s' AS stat, CAST(p50 AS BIGINT) AS value_s FROM p
         UNION ALL SELECT 'p90_s', p90 FROM p
         UNION ALL SELECT 'p99_s', p99 FROM p
         UNION ALL SELECT 'max_s', mx FROM p
         UNION ALL SELECT 'n_gaps', nl FROM p
         UNION ALL SELECT 'advised_gap_s',
           (p90 + 59) // 60 * 60 FROM p""")
}
