package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 71: weighted-state classics — the time-weighted
  * average (TWAP: what was the level ON AVERAGE OVER TIME, not over
  * samples) and ABC/Pareto classification (which slice of the catalog
  * carries 80% of the revenue). Both keep the exact-integer
  * discipline; the ns·cents products ride DECIMAL(38,0)/HUGEINT.
  */
object Wave71Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q329: per-user time-weighted average level --------------------
    // Each event sets the user's level (value cents) until the next
    // event; the final segment extends to the corpus max timestamp —
    // so Σ level·dt computes over a complete partition of the user's
    // observed lifetime. One lead over the user-partitioned window
    // (per-user histories bounded — the corpus-wide contract), the
    // ns-weighted sum in DECIMAL(38,0), ONE division per user at the
    // end, then TakeOrdered top-20 by (twap desc, user). The
    // point-in-time average (q08-style mean of samples) would weight a
    // burst of updates the same as a year-long steady level; this is
    // the monitoring/finance-correct aggregate.
    "q329_user_twap" -> ((s, d) => {
      val mx = table(s, d, "events").agg(max("ts").as("max_ts"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        .withColumn("nxt", lead("ts", 1).over(w))
        .crossJoin(broadcast(mx))
        .withColumn("dt", coalesce(col("nxt"), col("max_ts")) - col("ts"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(cents AS DECIMAL(38,0)) * dt")).as("wsum"),
          sum("dt").as("dts"))
        .filter(col("dts") > 0)
        .select(col("user_id"), col("n_events"),
          expr("CAST(wsum div dts AS BIGINT)").as("twap_cents"))
        .orderBy(col("twap_cents").desc, col("user_id"))
        .limit(20)
    }),

    // ---- q330: ABC / Pareto revenue classification ---------------------
    // Part revenue (one fact pass folds to the catalog frame), ranked
    // by (revenue desc, part) with an inclusive cumulative share:
    // class A while cum ≤ 80% of total, B while ≤ 95%, C beyond —
    // pure integer comparisons (cum·5 ≤ tot·4, cum·20 ≤ tot·19). The
    // ordered window runs over the catalog frame (≪ facts; the q93
    // two-phase rank replaces it at real catalog scale). Three rows
    // out: the classic "20% of parts, 80% of revenue" readout.
    "q330_abc_pareto_classes" -> ((s, d) => {
      val rev = table(s, d, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("rev"))
      val tot = rev.agg(sum("rev").as("tot"))
      rev
        .withColumn("cum", sum("rev").over(
          Window.orderBy(col("rev").desc, col("pk"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .withColumn("cls", expr(
          """CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END"""))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"), sum("rev").as("rev_cents"))
        .withColumn("part_share_ppm",
          expr("n_parts * 1000000 div sum(n_parts) OVER ()"))
        // rev_cents×1e6 passes ~9.2e18 at sf1 (total revenue ≈ 6e13
        // cents) — the ppm numerator goes through DECIMAL(38,0), the
        // q387 recipe; DuckDB's sum(BIGINT) is already HUGEINT so the
        // oracle needs nothing. Caught by the full-suite sf1 hash gate
        // (ANSI long overflow; count()-only benches prune the column).
        .withColumn("rev_share_ppm",
          expr("""(CAST(rev_cents AS DECIMAL(38,0)) * 1000000)
                  div sum(rev_cents) OVER ()"""))
    }))

  val oracle: Map[String, String] = Map(
    "q329_user_twap" ->
      """WITH mx AS (SELECT max(epoch_ns(ts)) AS max_ts FROM events),
         ev AS (
           SELECT user_id, epoch_ns(ts) AS ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         seg AS (
           SELECT user_id, cents,
             coalesce(lead(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), max_ts) - ts AS dt
           FROM ev, mx),
         agg AS (
           SELECT user_id, count(*) AS n_events,
             sum(CAST(cents AS HUGEINT) * dt) AS wsum,
             sum(dt) AS dts
           FROM seg GROUP BY 1)
         SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(wsum // dts AS BIGINT) AS twap_cents
         FROM agg WHERE dts > 0
         ORDER BY twap_cents DESC, user_id
         LIMIT 20""",

    "q330_abc_pareto_classes" ->
      """WITH rev AS (
           SELECT l_partkey AS pk,
             sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS rev
           FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(rev) AS tot FROM rev),
         c AS (
           SELECT rev,
             sum(rev) OVER (ORDER BY rev DESC, pk
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM rev),
         cls AS (
           SELECT rev,
             CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END AS cls
           FROM c, tot),
         g AS (
           SELECT cls, count(*) AS n_parts, sum(rev) AS rev_cents
           FROM cls GROUP BY 1)
         SELECT cls, CAST(n_parts AS BIGINT) AS n_parts,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(n_parts * 1000000 // sum(n_parts) OVER () AS BIGINT)
             AS part_share_ppm,
           CAST(rev_cents * 1000000 // sum(rev_cents) OVER () AS BIGINT)
             AS rev_share_ppm
         FROM g""")
}
