package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 96: physical-design inputs — the join fan-out profile
  * (the lines-per-order distribution a planner's cardinality model and
  * a denormalization decision both need) and the quantity-WEIGHTED
  * median unit price per brand (an unweighted median over line rows
  * answers "the median line"; the weighted one answers "the median
  * sold unit" — different question, same exact order-statistic
  * machinery with weight-cumulative sums).
  */
object Wave96Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q379: orders→lineitem fan-out profile ----------------------------
    // Lines-per-order histogram (left join keeps zero-line orders in
    // bucket 0), share ppm, and the fan-out moments every join-size
    // estimate starts from. Clamped at 10+ so the frame is bounded.
    "q379_join_fanout_profile" -> ((s, d) => {
      val fan = table(s, d, "orders")
        .select(col("o_orderkey").as("ok"))
        .join(table(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("ok"))
          .agg(count(lit(1)).as("k")), Seq("ok"), "left")
        .na.fill(0L, Seq("k"))
      fan.groupBy(expr("least(10, k)").as("fanout"))
        .agg(count(lit(1)).as("n_orders"), sum("k").as("n_lines"))
        .withColumn("share_ppm",
          expr("n_orders * 1000000 div sum(n_orders) OVER ()"))
    }),

    // ---- q380: quantity-weighted median unit price per brand --------------
    // Unit price cents = extended/quantity per line (both exact
    // integers; floor division pinned); the weighted median is the
    // smallest unit price whose cumulative QUANTITY covers half the
    // brand's total quantity — the q307 inclusive-CDF rule with
    // weights. Unweighted median rides along for the contrast.
    "q380_weighted_median_price" -> ((s, d) => {
      val lines = table(s, d, "lineitem")
        .join(table(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          expr("""CAST(floor(l_extendedprice * 100) AS BIGINT)
              div CAST(floor(l_quantity) AS BIGINT)""").as("unit_c"),
          expr("CAST(floor(l_quantity) AS BIGINT)").as("q"))
      val h = lines.groupBy("brand", "unit_c")
        .agg(sum("q").as("w"), count(lit(1)).as("c"))
      // Per-brand totals as whole-partition window sums riding the SAME
      // brand exchange+sort the running sums need — the former separate
      // groupBy(brand) aggregate + broadcast join re-aggregated h and
      // paid a join for values the window pass already has in hand
      // (guide §2.4: two operations keyed the same way share one
      // exchange). Integer sums — identical values either way.
      val cum = h
        .withColumn("cw", sum("w").over(
          Window.partitionBy("brand").orderBy("unit_c")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cc", sum("c").over(
          Window.partitionBy("brand").orderBy("unit_c")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tw", sum("w").over(Window.partitionBy("brand")))
        .withColumn("tc", sum("c").over(Window.partitionBy("brand")))
      cum.groupBy("brand")
        .agg(max("tc").as("n_lines"), max("tw").as("total_qty"),
          min(when(col("cw") * 2 >= col("tw"), col("unit_c")))
            .as("wmedian_unit_cents"),
          min(when(col("cc") * 2 >= col("tc"), col("unit_c")))
            .as("median_unit_cents"))
    }))

  val oracle: Map[String, String] = Map(
    "q379_join_fanout_profile" ->
      """WITH fan AS (
           SELECT o_orderkey AS ok, coalesce(k, 0) AS k
           FROM orders
           LEFT JOIN (SELECT l_orderkey, count(*) AS k
                      FROM lineitem GROUP BY 1) l
             ON o_orderkey = l_orderkey),
         g AS (
           SELECT least(10, k) AS fanout, count(*) AS n_orders,
             sum(k) AS n_lines
           FROM fan GROUP BY 1)
         SELECT CAST(fanout AS BIGINT) AS fanout,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_orders * 1000000 // sum(n_orders) OVER () AS BIGINT)
             AS share_ppm
         FROM g""",

    "q380_weighted_median_price" ->
      """WITH lines AS (
           SELECT p_brand AS brand,
             CAST(floor(l_extendedprice * 100) AS BIGINT)
               // CAST(floor(l_quantity) AS BIGINT) AS unit_c,
             CAST(floor(l_quantity) AS BIGINT) AS q
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         h AS (
           SELECT brand, unit_c, sum(q) AS w, count(*) AS c
           FROM lines GROUP BY 1, 2),
         t AS (SELECT brand, sum(w) AS tw, sum(c) AS tc
               FROM h GROUP BY 1),
         cum AS (
           SELECT brand, unit_c,
             sum(w) OVER (PARTITION BY brand ORDER BY unit_c
               ROWS UNBOUNDED PRECEDING) AS cw,
             sum(c) OVER (PARTITION BY brand ORDER BY unit_c
               ROWS UNBOUNDED PRECEDING) AS cc
           FROM h)
         SELECT t.brand, CAST(t.tc AS BIGINT) AS n_lines,
           CAST(t.tw AS BIGINT) AS total_qty,
           CAST(min(CASE WHEN cum.cw * 2 >= t.tw THEN cum.unit_c END)
             AS BIGINT) AS wmedian_unit_cents,
           CAST(min(CASE WHEN cum.cc * 2 >= t.tc THEN cum.unit_c END)
             AS BIGINT) AS median_unit_cents
         FROM cum JOIN t ON cum.brand = t.brand
         GROUP BY t.brand, t.tc, t.tw""")
}
