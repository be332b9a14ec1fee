package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 32: concentration analytics.
  *
  *   - q247 Pareto (80/20) revenue concentration per nation: the
  *     smallest supplier head that covers 80% of the nation's revenue
  *     — the concentration readout behind vendor-risk and
  *     dedup-payoff decisions, in exact integer cents/ppm.
  */
object Wave32Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q247: Pareto head per nation -----------------------------------
    // Revenue per supplier (DECIMAL(18,2) sum → exact cents, one
    // supplier-keyed shuffle), then per-NATION windows: rank by
    // revenue desc (s_suppkey tie-break) and a strictly-before
    // cumulative. A supplier is in the head while the revenue BEFORE
    // it is under 80% of the nation total — the smallest covering
    // head by construction. Both windows partition on the nation, so
    // concentration for a thousand nations runs fully parallel; the
    // per-nation frame is supplier-count sized.
    "q247_pareto_heads" -> ((s, d) => {
      val rev = table(s, d, "lineitem")
        .join(table(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").cast("long").as("nation"),
          col("s_suppkey"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      val order = Window.partitionBy("nation")
        .orderBy(col("cents").desc, col("s_suppkey").asc)
      val before = order.rowsBetween(Window.unboundedPreceding, -1)
      val tot = Window.partitionBy("nation")
      rev
        .withColumn("cum_before", coalesce(sum("cents").over(before),
          lit(0L)))
        .withColumn("n_total", sum("cents").over(tot))
        .withColumn("in_head",
          expr("CASE WHEN cum_before * 1000000L div n_total < 800000" +
            " THEN 1L ELSE 0L END"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n_suppliers"),
          sum("in_head").as("n_head"),
          expr("sum(CASE WHEN in_head = 1 THEN cents ELSE 0 END)" +
            " * 1000000L div sum(cents)").as("head_share_ppm"),
          sum("cents").as("total_cents"))
    }))

  val oracle: Map[String, String] = Map(
    "q247_pareto_heads" ->
      """WITH rev AS (
           SELECT CAST(s_nationkey AS BIGINT) AS nation, s_suppkey,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           GROUP BY 1, 2),
         w AS (
           SELECT nation, s_suppkey, cents,
                  coalesce(sum(cents) OVER (PARTITION BY nation
                    ORDER BY cents DESC, s_suppkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cum_before,
                  sum(cents) OVER (PARTITION BY nation) AS n_total
           FROM rev),
         h AS (
           SELECT nation, cents,
                  CASE WHEN cum_before * 1000000 // n_total < 800000
                       THEN 1 ELSE 0 END AS in_head
           FROM w)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
                CAST(sum(in_head) AS BIGINT) AS n_head,
                CAST(sum(CASE WHEN in_head = 1 THEN cents ELSE 0 END)
                     * 1000000 // sum(cents) AS BIGINT)
                  AS head_share_ppm,
                CAST(sum(cents) AS BIGINT) AS total_cents
         FROM h GROUP BY 1""")
}
