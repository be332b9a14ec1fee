package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 89: inventory and randomness diagnostics — the
  * newsvendor critical-fractile stocking level per brand (the exact
  * demand quantile that balances under- vs over-stocking at a 3:1
  * cost ratio) and the Wald–Wolfowitz runs test on the daily revenue
  * series (is the above/below-median pattern random, or does the
  * series cluster).
  */
object Wave89Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q365: newsvendor critical-fractile stock per brand -------------
    // Weekly demand per brand (one fact fold to the brand×week frame),
    // then the 3/4-fractile order statistic (underage:overage = 3:1 →
    // stock at P[D ≤ q] ≥ 3/4) by the inclusive-CDF rule on the
    // per-brand weekly-demand histogram, plus the mean for contrast —
    // stocking to the mean under asymmetric costs is the classic
    // mistake this operator exists to correct.
    "q365_newsvendor_stock" -> ((s, d) => {
      val weekly = table(s, d, "lineitem")
        .join(table(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"),
          expr("""datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')
              div 7""").as("wk"))
        .agg(sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("dem"))
      val h = weekly.groupBy("brand", "dem").agg(count(lit(1)).as("c"))
      val cum = h.withColumn("cum", sum("c").over(
          Window.partitionBy("brand").orderBy("dem")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(weekly.groupBy("brand")
          .agg(count(lit(1)).as("n_weeks"), sum("dem").as("tot"))),
          "brand")
      cum.groupBy("brand")
        .agg(max("n_weeks").as("n_weeks"),
          expr("max(tot) * 1000000 div max(n_weeks)")
            .as("mean_demand_micro"),
          min(when(col("cum") * 4 >= col("n_weeks") * 3, col("dem")))
            .as("stock_q75"))
    }),

    // ---- q366: Wald–Wolfowitz runs test on daily revenue ----------------
    // Daily cents vs the exact median (inclusive-CDF); the run count
    // is 1 + Σ[sign ≠ previous sign] over the bounded day frame;
    // expected runs under randomness = 2·n1·n2/n + 1 in micro. A
    // large deficit means the series clusters (trends/regimes); the
    // spec pins the recompute and the sign partition.
    "q366_runs_test" -> ((s, d) => {
      val daily = table(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val h = daily.groupBy("cents").agg(count(lit(1)).as("c"))
      val med = h.withColumn("cum", sum("c").over(
          Window.orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(h.agg(sum("c").as("n"))))
        .agg(min(when(col("cum") * 2 >= col("n"), col("cents")))
          .as("median"))
      val signed = daily.crossJoin(broadcast(med))
        .withColumn("sgn", (col("cents") > col("median")).cast("long"))
        .withColumn("chg", when(
          lag("sgn", 1).over(Window.orderBy("day")).isNull ||
            lag("sgn", 1).over(Window.orderBy("day")) =!= col("sgn"),
          1L).otherwise(0L))
      signed.agg(
          count(lit(1)).as("n_days"),
          sum("sgn").as("n_above"),
          (count(lit(1)) - sum("sgn")).as("n_below"),
          sum("chg").as("runs"),
          max("median").as("median_cents"))
        .select(col("n_days"), col("n_above"), col("n_below"),
          col("runs"),
          expr("""2 * n_above * n_below * 1000000 div n_days
              + 1000000""").as("expected_runs_micro"),
          expr("""runs * 1000000 -
              (2 * n_above * n_below * 1000000 div n_days + 1000000)""")
            .as("deficit_micro"),
          col("median_cents"))
    }))

  val oracle: Map[String, String] = Map(
    "q365_newsvendor_stock" ->
      """WITH weekly AS (
           SELECT p_brand AS brand,
             (CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7 AS wk,
             sum(CAST(floor(l_quantity) AS BIGINT)) AS dem
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2),
         h AS (SELECT brand, dem, count(*) AS c
               FROM weekly GROUP BY 1, 2),
         t AS (SELECT brand, count(*) AS n_weeks, sum(dem) AS tot
               FROM weekly GROUP BY 1),
         cum AS (
           SELECT brand, dem,
             sum(c) OVER (PARTITION BY brand ORDER BY dem
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM h)
         SELECT t.brand, CAST(t.n_weeks AS BIGINT) AS n_weeks,
           CAST(t.tot * 1000000 // t.n_weeks AS BIGINT)
             AS mean_demand_micro,
           CAST(min(CASE WHEN cum.cum * 4 >= t.n_weeks * 3
             THEN cum.dem END) AS BIGINT) AS stock_q75
         FROM cum JOIN t ON cum.brand = t.brand
         GROUP BY t.brand, t.n_weeks, t.tot""",

    "q366_runs_test" ->
      """WITH daily AS (
           SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1),
         h AS (SELECT cents, count(*) AS c FROM daily GROUP BY 1),
         n AS (SELECT sum(c) AS n FROM h),
         med AS (
           SELECT min(CASE WHEN cum * 2 >= n THEN cents END) AS median
           FROM (SELECT cents, sum(c) OVER (ORDER BY cents
                   ROWS UNBOUNDED PRECEDING) AS cum FROM h), n),
         signed AS (
           SELECT day, cents,
             CASE WHEN cents > median THEN 1 ELSE 0 END AS sgn
           FROM daily, med),
         chg AS (
           SELECT sgn, median,
             CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                    OR lag(sgn) OVER (ORDER BY day) <> sgn
               THEN 1 ELSE 0 END AS chg
           FROM signed, med),
         agg AS (
           SELECT count(*) AS n_days, sum(sgn) AS n_above,
             count(*) - sum(sgn) AS n_below, sum(chg) AS runs,
             max(median) AS median_cents
           FROM chg)
         SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(n_above AS BIGINT) AS n_above,
           CAST(n_below AS BIGINT) AS n_below,
           CAST(runs AS BIGINT) AS runs,
           CAST(2 * n_above * n_below * 1000000 // n_days + 1000000
             AS BIGINT) AS expected_runs_micro,
           CAST(runs * 1000000
             - (2 * n_above * n_below * 1000000 // n_days + 1000000)
             AS BIGINT) AS deficit_micro,
           CAST(median_cents AS BIGINT) AS median_cents
         FROM agg""")
}
