package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 78: OLAP cube reporting (the native `cube` operator —
  * all four grouping sets of region × order-year in one pass, partial
  * aggregation included) and a per-entity profile-anomaly scan
  * (chi-square of each user's event-type mix against the corpus
  * profile, zero cells included via the bounded type grid).
  */
object Wave78Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q343: revenue cube over region × order year --------------------
    // `cube` emits all 2² grouping sets with ONE shuffle (Spark
    // expands grouping sets map-side; partial aggregation still
    // applies); '__all__' marks the rolled-up level, matching the
    // corpus-wide rollup convention (q? rollup queries). Joins walk
    // the dimension chain customer→nation→region (dimension side,
    // AQE broadcasts them).
    "q343_cube_revenue" -> ((s, d) => {
      val o = table(s, d, "orders")
        .join(table(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(table(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(table(s, d, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"),
          date_format(col("o_orderdate"), "yyyy").as("yr"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
      o.cube(col("r_name"), col("yr"))
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
        .select(coalesce(col("r_name"), lit("__all__")).as("region"),
          coalesce(col("yr"), lit("__all__")).as("yr"),
          col("n_orders"), col("rev_cents"))
    }),

    // ---- q344: per-user event-mix chi-square anomalies ------------------
    // Observed (user, type) counts vs expected n_u·c_t/N; zero cells
    // ride the bounded user×type grid (|types| rows per user — the
    // grid is corpus-keyed × a 5-value domain, never quadratic).
    // χ²_micro = Σ (o·N − n_u·c_t)²·1e6 div (n_u·c_t·N) in
    // DECIMAL(38,0) — the exact-integer scaled statistic; top-20
    // most-anomalous users by (χ² desc, user) via TakeOrdered. The
    // "bot detector" shape: users whose mix diverges hardest from the
    // corpus.
    "q344_user_profile_anomaly" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), col("event_type"))
      val tot = ev.agg(count(lit(1)).as("nn"))
      val types = ev.groupBy("event_type")
        .agg(count(lit(1)).as("c_t"))
      val userN = ev.groupBy("user_id").agg(count(lit(1)).as("n_u"))
      val obs = ev.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("o"))
      userN.crossJoin(broadcast(types))
        .join(obs, Seq("user_id", "event_type"), "left")
        .na.fill(0L, Seq("o"))
        .crossJoin(broadcast(tot))
        .select(col("user_id"), col("n_u"),
          expr("""CAST(
              (CAST(o AS DECIMAL(38,0)) * nn
               - CAST(n_u AS DECIMAL(38,0)) * c_t)
              * (CAST(o AS DECIMAL(38,0)) * nn
                 - CAST(n_u AS DECIMAL(38,0)) * c_t) * 1000000
              div (CAST(n_u AS DECIMAL(38,0)) * c_t * nn) AS BIGINT)""")
            .as("term"))
        .groupBy("user_id")
        .agg(max("n_u").as("n_events"), sum("term").as("chi2_micro"))
        .orderBy(col("chi2_micro").desc, col("user_id"))
        .limit(20)
    }))

  val oracle: Map[String, String] = Map(
    "q343_cube_revenue" ->
      """WITH o AS (
           SELECT r_name,
             strftime(CAST(o_orderdate AS DATE), '%Y') AS yr,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey)
         SELECT coalesce(r_name, '__all__') AS region,
           coalesce(yr, '__all__') AS yr,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS rev_cents
         FROM o GROUP BY CUBE (r_name, yr)""",

    "q344_user_profile_anomaly" ->
      """WITH ev AS (SELECT user_id, event_type FROM events),
         tot AS (SELECT count(*) AS nn FROM ev),
         ty AS (SELECT event_type, count(*) AS c_t FROM ev GROUP BY 1),
         un AS (SELECT user_id, count(*) AS n_u FROM ev GROUP BY 1),
         obs AS (SELECT user_id, event_type, count(*) AS o
                 FROM ev GROUP BY 1, 2),
         grid AS (
           SELECT un.user_id, un.n_u, ty.event_type, ty.c_t,
             coalesce(obs.o, 0) AS o
           FROM un CROSS JOIN ty
           LEFT JOIN obs ON obs.user_id = un.user_id
             AND obs.event_type = ty.event_type),
         terms AS (
           SELECT user_id, n_u,
             (CAST(o AS HUGEINT) * nn - CAST(n_u AS HUGEINT) * c_t)
             * (CAST(o AS HUGEINT) * nn - CAST(n_u AS HUGEINT) * c_t)
             * 1000000
             // (CAST(n_u AS HUGEINT) * c_t * nn) AS term
           FROM grid, tot)
         SELECT user_id, CAST(max(n_u) AS BIGINT) AS n_events,
           CAST(sum(term) AS BIGINT) AS chi2_micro
         FROM terms GROUP BY user_id
         ORDER BY chi2_micro DESC, user_id
         LIMIT 20""")
}
