package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 98: dependence structure — a status-consistency
  * crosstab between the order header and its lines (the denormalized
  * fields that MUST agree, audited) and the empirical copula density
  * grid (rank-dependence between customer tenure and spend: decile ×
  * decile cell counts vs the uniform-independence expectation — the
  * distribution-free dependence heatmap).
  */
object Wave98Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q383: header/line status consistency crosstab -------------------
    // Every (o_orderstatus, l_linestatus) combination with counts and
    // corpus share; the verdict column flags combinations the
    // denormalization contract forbids (an 'F' order with an 'O'
    // line). One equi-join shuffle, bounded crosstab out.
    "q383_status_consistency" -> ((s, d) => {
      table(s, d, "orders")
        .join(table(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus").as("o_status"),
          col("l_linestatus").as("l_status"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share_ppm",
          expr("n * 1000000 div sum(n) OVER ()"))
        .withColumn("verdict", expr(
          """CASE
             WHEN o_status = 'F' AND l_status = 'O' THEN 'violation'
             WHEN o_status = 'O' AND l_status = 'F' THEN 'partial'
             ELSE 'consistent' END"""))
    }),

    // ---- q384: empirical copula density grid ------------------------------
    // Per customer: tenure days (first→last order) and total spend;
    // both axes decile-scored by the exact inclusive-CDF cuts; the
    // 10×10 cell counts against the n/100 independence expectation in
    // ppm (1e6 = independent). Diagonal mass = positive rank
    // dependence. Distribution-free, exact integers throughout.
    "q384_copula_grid" -> ((s, d) => {
      val cust = table(s, d, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(
          (max(expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"))
            - min(expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")))
            .cast("long").as("tenure"),
          sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .as("spend"))
      def cuts(colName: String, tag: String): DataFrame = {
        val h = cust.groupBy(colName).agg(count(lit(1)).as("c"))
          .withColumnRenamed(colName, "v")
        h.withColumn("cum", sum("c").over(Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(h.agg(sum("c").as("n"))))
          .crossJoin(broadcast(
            cust.sparkSession.range(1, 10).select(col("id").as("j"))))
          .filter(col("cum") * 10 >= col("n") * col("j"))
          .groupBy("j").agg(min("v").as("thr"))
          .agg(expr("sort_array(collect_list(struct(j, thr)))").as("t"))
          .select(expr("transform(t, x -> x.thr)").as(s"${tag}_cuts"))
      }
      val scored = cust
        .crossJoin(broadcast(cuts("tenure", "t")))
        .crossJoin(broadcast(cuts("spend", "s")))
        .select(
          expr("1 + size(filter(t_cuts, c -> tenure >= c))").as("t_dec"),
          expr("1 + size(filter(s_cuts, c -> spend >= c))").as("s_dec"))
      val tot = cust.agg(count(lit(1)).as("n_cust"))
      scored.groupBy("t_dec", "s_dec").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("t_dec").cast("long").as("tenure_decile"),
          col("s_dec").cast("long").as("spend_decile"), col("n"),
          expr("n * 100 * 1000000 div n_cust").as("density_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q383_status_consistency" ->
      """WITH g AS (
           SELECT o_orderstatus AS o_status, l_linestatus AS l_status,
             count(*) AS n
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY 1, 2)
         SELECT o_status, l_status, CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS share_ppm,
           CASE
             WHEN o_status = 'F' AND l_status = 'O' THEN 'violation'
             WHEN o_status = 'O' AND l_status = 'F' THEN 'partial'
             ELSE 'consistent' END AS verdict
         FROM g""",

    "q384_copula_grid" ->
      """WITH cust AS (
           SELECT o_custkey AS ck,
             CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
               - min(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
               AS BIGINT) AS tenure,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS spend
           FROM orders GROUP BY 1),
         nc AS (SELECT count(*) AS n_cust FROM cust),
         th AS (
           SELECT jj.j, min(c.v) AS thr
           FROM (SELECT tenure AS v,
                   sum(count(*)) OVER (ORDER BY tenure
                     ROWS UNBOUNDED PRECEDING) AS cum
                 FROM cust GROUP BY tenure) c,
             nc, (SELECT unnest(range(1, 10)) AS j) jj
           WHERE c.cum * 10 >= nc.n_cust * jj.j
           GROUP BY 1),
         sh AS (
           SELECT jj.j, min(c.v) AS thr
           FROM (SELECT spend AS v,
                   sum(count(*)) OVER (ORDER BY spend
                     ROWS UNBOUNDED PRECEDING) AS cum
                 FROM cust GROUP BY spend) c,
             nc, (SELECT unnest(range(1, 10)) AS j) jj
           WHERE c.cum * 10 >= nc.n_cust * jj.j
           GROUP BY 1),
         scored AS (
           SELECT
             1 + (SELECT count(*) FROM th WHERE cust.tenure >= th.thr)
               AS t_dec,
             1 + (SELECT count(*) FROM sh WHERE cust.spend >= sh.thr)
               AS s_dec
           FROM cust),
         g AS (
           SELECT t_dec, s_dec, count(*) AS n
           FROM scored GROUP BY 1, 2)
         SELECT CAST(t_dec AS BIGINT) AS tenure_decile,
           CAST(s_dec AS BIGINT) AS spend_decile,
           CAST(n AS BIGINT) AS n,
           CAST(n * 100 * 1000000 // n_cust AS BIGINT) AS density_ppm
         FROM g, nc""")
}
