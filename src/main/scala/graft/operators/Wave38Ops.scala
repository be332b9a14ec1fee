package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 38: optimizer reasoning + stateful windows + forecasting.
  *
  *   - q260 join-order advisor: System-R intermediate-size estimates
  *     for the three orders of a 3-table DAG — the CBO decision,
  *     emitted as an auditable query.
  *   - q261 floor-clamped running balance: the "credits can't go
  *     negative" state machine, distributed via the prefix-sum
  *     identity R_t = S_t − min(0, min_{s≤t} S_s) — windows only, no
  *     sequential recursion.
  *   - q262 seasonal-naive forecast evaluation: lag-7 baseline error
  *     (MAE, WAPE) per series — the forecast-eval loop every
  *     monitoring pipeline runs, integer-exact.
  */
object Wave38Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q260: join-order advisor --------------------------------------
    // For lineitem ⋈ orders ⋈ customer the planner's real choice is
    // which join runs first; System-R scores each order by its
    // INTERMEDIATE cardinality (the only term that differs — the
    // final size is order-invariant under the uniformity model).
    // Starting with the keyless pair (lineitem × customer) scores as
    // a cross product — the advisor's job is to rank exactly that
    // catastrophically last. Six scalar stats (3 counts + 3 ndv)
    // computed in 3 map-side-combined aggregates, cross-joined 1-row
    // frames, a 3-row output ranked by estimate. At 100 TB these
    // stats come from ANALYZE metadata instead of scans; the
    // arithmetic — and this audit — are unchanged.
    "q260_join_order_advisor" -> ((s, d) => {
      val ls = table(s, d, "lineitem")
        .agg(count(lit(1)).as("n_l"),
          countDistinct("l_orderkey").as("ndv_l_ok"))
      val os = table(s, d, "orders")
        .agg(count(lit(1)).as("n_o"),
          countDistinct("o_orderkey").as("ndv_o_ok"),
          countDistinct("o_custkey").as("ndv_o_ck"))
      val cs = table(s, d, "customer")
        .agg(count(lit(1)).as("n_c"),
          countDistinct("c_custkey").as("ndv_c_ck"))
      val stats = ls.crossJoin(os).crossJoin(cs)
      val est = stats.select(
        expr("n_l * n_o div greatest(ndv_l_ok, ndv_o_ok)").as("lo"),
        expr("n_o * n_c div greatest(ndv_o_ck, ndv_c_ck)").as("oc"),
        expr("n_l * n_c").as("lc"))
      est.select(explode(array(
          struct(lit("lineitem_orders_first").as("join_order"),
            col("lo").as("est_intermediate_rows")),
          struct(lit("orders_customer_first").as("join_order"),
            col("oc").as("est_intermediate_rows")),
          struct(lit("lineitem_customer_first").as("join_order"),
            col("lc").as("est_intermediate_rows")))).as("p"))
        .select(col("p.join_order").as("join_order"),
          col("p.est_intermediate_rows").as("est_intermediate_rows"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("est_intermediate_rows"),
            col("join_order"))).cast("long"))
    }),

    // ---- q261: floor-clamped running balance ---------------------------
    // Balance starts at 0, purchases credit +cents, clicks debit
    // −cents, and the balance FLOORS at 0 (a debit against an empty
    // balance burns only what exists). The clamped process is not a
    // plain prefix sum — but for a floor-only clamp it has the closed
    // form R_t = S_t − min(0, min_{s≤t} S_s), so two per-user windows
    // (cumsum + running min) compute the exact sequential semantics
    // with NO driver-side recursion and no UDAF state. Frames
    // partition on user_id — co-partitioned with every other per-user
    // stage, never corpus-sized. Output: final balance, total credits/
    // debits, and the deficit the floor absorbed (burned debits).
    "q261_clamped_balance" -> ((s, d) => {
      val ev = table(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .otherwise(expr("-CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .as("delta"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = ev
        .withColumn("s", sum("delta").over(w))
        .withColumn("m", min("s").over(w))
      cum.groupBy("user_id").agg(
          max(struct(col("ts"), col("event_id"), col("s"), col("m")))
            .as("last"),
          sum(when(col("delta") > 0, col("delta")).otherwise(0L))
            .as("credits"),
          sum(when(col("delta") < 0, -col("delta")).otherwise(0L))
            .as("debits"))
        .select(col("user_id"),
          expr("last.s - least(0L, last.m)").as("final_balance"),
          col("credits"), col("debits"),
          expr("-least(0L, last.m)").as("burned_debits"))
    }),

    // ---- q262: seasonal-naive forecast evaluation ----------------------
    // Per-type daily cents series (calendar-bounded frames, as q250);
    // forecast(d) = y(d−7) via lag(7) over the per-type window —
    // row-lag equals calendar-lag here because the generator emits
    // every day, and the oracle shares the same definition either
    // way. MAE and WAPE in exact integer cents/ppm.
    "q262_seasonal_forecast_eval" -> ((s, d) => {
      val daily = table(s, d, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily.withColumn("yhat", lag("y", 7).over(w))
        .filter(col("yhat").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days_eval"),
          sum(abs(col("y") - col("yhat"))).as("total_abs_err"),
          sum("y").as("total_actual"))
        .select(col("event_type"), col("n_days_eval"),
          col("total_abs_err"),
          expr("total_abs_err div n_days_eval").as("mae_cents"),
          expr("total_abs_err * 1000000 div total_actual").as("wape_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q260_join_order_advisor" ->
      """WITH ls AS (SELECT count(*) AS n_l,
             count(DISTINCT l_orderkey) AS ndv_l_ok FROM lineitem),
         os AS (SELECT count(*) AS n_o,
             count(DISTINCT o_orderkey) AS ndv_o_ok,
             count(DISTINCT o_custkey) AS ndv_o_ck FROM orders),
         cs AS (SELECT count(*) AS n_c,
             count(DISTINCT c_custkey) AS ndv_c_ck FROM customer),
         est AS (
           SELECT 'lineitem_orders_first' AS join_order,
             n_l * n_o // greatest(ndv_l_ok, ndv_o_ok)
               AS est_intermediate_rows
           FROM ls CROSS JOIN os
           UNION ALL
           SELECT 'orders_customer_first',
             n_o * n_c // greatest(ndv_o_ck, ndv_c_ck)
           FROM os CROSS JOIN cs
           UNION ALL
           SELECT 'lineitem_customer_first', n_l * n_c
           FROM ls CROSS JOIN cs)
         SELECT join_order, est_intermediate_rows,
           CAST(row_number() OVER (ORDER BY est_intermediate_rows,
             join_order) AS BIGINT) AS rank
         FROM est""",

    "q261_clamped_balance" ->
      """WITH ev AS (
           SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
               THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
               ELSE -CAST(floor(value * 100 + 0.5) AS BIGINT) END AS delta
           FROM events WHERE event_type IN ('purchase', 'click')),
         cum1 AS (
           SELECT user_id, delta, ts, event_id,
             CAST(sum(delta) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS s
           FROM ev),
         cum AS (
           SELECT user_id, delta, s,
             CAST(min(s) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS m,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM cum1)
         SELECT user_id,
           max(CASE WHEN rn = 1 THEN s - least(0, m) END) AS final_balance,
           CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS BIGINT)
             AS credits,
           CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END) AS BIGINT)
             AS debits,
           max(CASE WHEN rn = 1 THEN -least(0, m) END) AS burned_debits
         FROM cum GROUP BY user_id""",

    "q262_seasonal_forecast_eval" ->
      """WITH daily AS (
           SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
           FROM events GROUP BY 1, 2),
         f AS (
           SELECT event_type, y,
             lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
           FROM daily)
         SELECT event_type, count(*) AS n_days_eval,
           CAST(sum(abs(y - yhat)) AS BIGINT) AS total_abs_err,
           CAST(sum(abs(y - yhat)) // count(*) AS BIGINT) AS mae_cents,
           CAST(sum(abs(y - yhat)) * 1000000 // sum(y) AS BIGINT)
             AS wape_ppm
         FROM f WHERE yhat IS NOT NULL GROUP BY event_type""")
}
