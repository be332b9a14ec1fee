package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 30: feature engineering.
  *
  *   - q244 RFM customer features: recency / frequency / monetary per
  *     customer with 0–4 value-bucket scores and the composite RFM
  *     code — the canonical feature-store table a churn or LTV model
  *     trains on.
  */
object Wave30Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q244: RFM customer features -----------------------------------
    // One orders scan → per-customer rollup (max day, order count,
    // DECIMAL(18,2) money sum → exact cents). Scores are value buckets
    // from 1-row scalar maxima (the q226 binning recipe — rank
    // quintiles would need the q232 percentile machinery; value
    // buckets are the deterministic, broadcast-only form), recency
    // inverted so recent customers score high. The whole feature
    // build is one shuffle keyed on the customer — the feature-store
    // write shape.
    "q244_rfm_features" -> ((s, d) => {
      val per = table(s, d, "orders")
        .select(col("o_custkey").as("customer"),
          expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"),
          col("o_totalprice"))
        .groupBy("customer")
        .agg(max("day").as("last_day"), count(lit(1)).as("f_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("m_dec"))
        .select(col("customer"), col("last_day"), col("f_orders"),
          (col("m_dec") * 100).cast("long").as("m_cents"))
      // max(r_days) == max_day - min(last_day): one scalar frame
      // carries every bucket width.
      val mx = per.agg(max("last_day").as("max_day"),
        min("last_day").as("min_day"),
        max("f_orders").as("max_f"), max("m_cents").as("max_m"))
      per.crossJoin(broadcast(mx))
        .withColumn("r_days", expr("max_day - last_day"))
        .withColumn("max_r", expr("max_day - min_day"))
        .select(col("customer"), col("r_days"), col("f_orders"),
          col("m_cents"),
          expr("4 - (r_days div (max_r div 5 + 1))").as("r_score"),
          expr("f_orders div (max_f div 5 + 1)").as("f_score"),
          expr("m_cents div (max_m div 5 + 1)").as("m_score"))
        .withColumn("rfm_code",
          expr("r_score * 100 + f_score * 10 + m_score"))
    }))

  val oracle: Map[String, String] = Map(
    "q244_rfm_features" ->
      """WITH per AS (
           SELECT o_custkey AS customer,
                  max(epoch_ms(o_orderdate) // 86400000) AS last_day,
                  count(*) AS f_orders,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS m_cents
           FROM orders GROUP BY 1),
         mx AS (
           SELECT max(last_day) AS max_day, min(last_day) AS min_day,
                  max(f_orders) AS max_f, max(m_cents) AS max_m
           FROM per),
         sc AS (
           SELECT customer, max_day - last_day AS r_days, f_orders,
                  m_cents,
                  4 - ((max_day - last_day)
                       // ((max_day - min_day) // 5 + 1)) AS r_score,
                  f_orders // (max_f // 5 + 1) AS f_score,
                  m_cents // (max_m // 5 + 1) AS m_score
           FROM per CROSS JOIN mx)
         SELECT customer, CAST(r_days AS BIGINT) AS r_days,
                CAST(f_orders AS BIGINT) AS f_orders,
                CAST(m_cents AS BIGINT) AS m_cents,
                CAST(r_score AS BIGINT) AS r_score,
                CAST(f_score AS BIGINT) AS f_score,
                CAST(m_score AS BIGINT) AS m_score,
                CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
                  AS rfm_code
         FROM sc""")
}
