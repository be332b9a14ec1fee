package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 79: robust-statistics reporting — winsorized and
  * trimmed means with EXACT p5/p95 order-statistic fences (the q307
  * inclusive-CDF on the value-frequency frame), and a leave-one-out
  * regression influence scan (each day's effect on the trend slope
  * from ONE global moment pass — the Cook's-distance shape without a
  * per-point refit).
  */
object Wave79Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q345: winsorized + trimmed order-value means ------------------
    // Fences p5/p95 by the inclusive-CDF rule (min v with cum·20 ≥
    // n·k) on the cents-frequency frame; then one corpus pass computes
    // the raw mean, the winsorized mean (values clamped to the
    // fences), and the trimmed mean (fence-exceeding values dropped) —
    // all in exact micro-cents with one final division each. The
    // robust pair every metrics pipeline wants when a fat tail
    // pollutes the raw mean.
    "q345_robust_means" -> ((s, d) => {
      val v = table(s, d, "orders")
        .select(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
          .as("c"))
      val h = v.groupBy("c").agg(count(lit(1)).as("n"))
      val cum = h.withColumn("cum", sum("n").over(
          Window.orderBy("c")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(h.agg(sum("n").as("nn"))))
      val fences = cum
        .agg(min(when(col("cum") * 20 >= col("nn"), col("c"))).as("p5"),
          min(when(col("cum") * 20 >= col("nn") * 19, col("c")))
            .as("p95"))
      // The micro-cent numerators pass sum(c)≈2.3e13 at sf1, so ×1e6
      // overflows BIGINT — DECIMAL(38,0) intermediates (q387 recipe);
      // DuckDB's sum(BIGINT) is already HUGEINT, oracle unchanged.
      // Caught by the full-suite sf1 hash gate (ANSI long overflow;
      // count()-only benches prune these columns).
      v.crossJoin(broadcast(fences))
        .agg(count(lit(1)).as("n_orders"),
          max("p5").as("p5_cents"), max("p95").as("p95_cents"),
          expr("""(CAST(sum(c) AS DECIMAL(38,0)) * 1000000)
              div count(1)""").as("mean_micro"),
          expr("""(CAST(sum(greatest(p5, least(p95, c)))
                AS DECIMAL(38,0)) * 1000000
              div count(1))""").as("winsor_micro"),
          expr("""(CAST(sum(CASE WHEN c >= p5 AND c <= p95 THEN c
                ELSE 0 END) AS DECIMAL(38,0)) * 1000000)
              div sum(CASE WHEN c >= p5 AND c <= p95 THEN 1 ELSE 0 END)
            """).as("trim_micro"),
          sum(expr("CASE WHEN c < p5 OR c > p95 THEN 1 ELSE 0 END"))
            .as("n_trimmed"))
    }),

    // ---- q346: leave-one-out slope influence per day -------------------
    // Daily revenue series (bounded day frame); global OLS moments in
    // DECIMAL(38,0) broadcast to every row; each day's LOO slope uses
    // only the global sums minus its own (x, y) — O(1) per row, no
    // refit. Influence = slope_all − slope_without_day in ppm; top-10
    // days by (|influence| desc, day). The "which single day bent the
    // trend" diagnostic.
    "q346_slope_influence" -> ((s, d) => {
      val daily = table(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("y"))
        .withColumn("x",
          row_number().over(Window.orderBy("day")).cast("long"))
      val m = daily.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      daily.crossJoin(broadcast(m))
        .withColumn("slope_all", expr(
          """CAST((CAST(n AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
             div (CAST(n AS DECIMAL(38,0)) * sxx
                - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)"""))
        .withColumn("slope_loo", expr(
          """CAST((CAST(n - 1 AS DECIMAL(38,0)) * (sxy
                 - CAST(x AS DECIMAL(38,0)) * y)
               - CAST(sx - x AS DECIMAL(38,0)) * (sy - y)) * 1000000
             div (CAST(n - 1 AS DECIMAL(38,0)) * (sxx
                 - CAST(x AS DECIMAL(38,0)) * x)
               - CAST(sx - x AS DECIMAL(38,0)) * (sx - x))
             AS BIGINT)"""))
        .select(col("day"), col("y").as("cents"),
          col("slope_all").as("slope_all_ppm"),
          col("slope_loo").as("slope_loo_ppm"),
          (col("slope_all") - col("slope_loo")).as("influence_ppm"))
        .orderBy(abs(col("influence_ppm")).desc, col("day"))
        .limit(10)
    }))

  val oracle: Map[String, String] = Map(
    "q345_robust_means" ->
      """WITH v AS (
           SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
         h AS (SELECT c, count(*) AS n FROM v GROUP BY 1),
         cum AS (
           SELECT c,
             sum(n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum
           FROM h),
         nn AS (SELECT sum(n) AS nn FROM h),
         f AS (
           SELECT
             min(CASE WHEN cum * 20 >= nn THEN c END) AS p5,
             min(CASE WHEN cum * 20 >= nn * 19 THEN c END) AS p95
           FROM cum, nn)
         SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(p5) AS BIGINT) AS p5_cents,
           CAST(max(p95) AS BIGINT) AS p95_cents,
           CAST(sum(c) * 1000000 // count(*) AS BIGINT) AS mean_micro,
           CAST(sum(greatest(p5, least(p95, c))) * 1000000 // count(*)
             AS BIGINT) AS winsor_micro,
           CAST(sum(CASE WHEN c >= p5 AND c <= p95 THEN c ELSE 0 END)
             * 1000000
             // sum(CASE WHEN c >= p5 AND c <= p95 THEN 1 ELSE 0 END)
             AS BIGINT) AS trim_micro,
           CAST(sum(CASE WHEN c < p5 OR c > p95 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_trimmed
         FROM v, f""",

    "q346_slope_influence" ->
      """WITH daily AS (
           SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS y
           FROM orders GROUP BY 1),
         xd AS (
           SELECT day, y,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS x
           FROM daily),
         m AS (
           SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy
           FROM xd),
         sc AS (
           SELECT day, y,
             CAST((CAST(n AS HUGEINT) * sxy
                 - CAST(sx AS HUGEINT) * sy) * 1000000
               // (CAST(n AS HUGEINT) * sxx
                  - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS slope_all,
             CAST((CAST(n - 1 AS HUGEINT) * (sxy
                   - CAST(x AS HUGEINT) * y)
                 - CAST(sx - x AS HUGEINT) * (sy - y)) * 1000000
               // (CAST(n - 1 AS HUGEINT) * (sxx
                   - CAST(x AS HUGEINT) * x)
                 - CAST(sx - x AS HUGEINT) * (sx - x)) AS BIGINT)
               AS slope_loo
           FROM xd, m)
         SELECT day, CAST(y AS BIGINT) AS cents,
           slope_all AS slope_all_ppm, slope_loo AS slope_loo_ppm,
           CAST(slope_all - slope_loo AS BIGINT) AS influence_ppm
         FROM sc
         ORDER BY abs(slope_all - slope_loo) DESC, day
         LIMIT 10""")
}
