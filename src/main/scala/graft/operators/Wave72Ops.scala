package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 72: sampling design and series coupling — Neyman
  * (variance-optimal) sample allocation with exact largest-remainder
  * rounding, and a lead-lag regression scan between two daily series.
  * Both fold the corpus to tiny frames (strata / days) in one pass and
  * do the numeric work there in exact integers.
  */
object Wave72Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q331: Neyman allocation with largest-remainder rounding -------
    // A 1000-row sampling budget split across event-type strata
    // ∝ n_h·σ_h (the allocation that minimizes the stratified-mean
    // variance). σ_h is the integer sqrt of the population variance in
    // cents² (numerator in DECIMAL(38,0); the sqrt argument is < 2⁵³
    // so the double is exact and the floor deterministic). Rounding is
    // exact largest-remainder: base = ⌊B·w_h/W⌋, the B − Σbase
    // leftover units go to the largest remainders (full tie-break) —
    // Σalloc = B exactly, certified by the spec. All arithmetic on the
    // |strata| frame.
    "q331_neyman_allocation" -> ((s, d) => {
      val st = table(s, d, "events")
        .select(col("event_type").as("et"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("x"))
        .groupBy("et")
        .agg(count(lit(1)).as("n_h"), sum("x").as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .withColumn("var_c2", expr(
          """CAST((CAST(n_h AS DECIMAL(38,0)) * sxx
               - CAST(sx AS DECIMAL(38,0)) * sx)
             div (CAST(n_h AS DECIMAL(38,0)) * n_h) AS BIGINT)"""))
        .withColumn("sd_cents", expr(
          "CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT)"))
        .withColumn("w", col("n_h") * col("sd_cents"))
      val b = lit(1000L)
      val alloc = st
        .withColumn("tot_w", expr("sum(w) OVER ()"))
        .withColumn("base", expr("(1000 * w) div tot_w"))
        .withColumn("rem", expr("(1000 * w) % tot_w"))
        .withColumn("leftover",
          (b - expr("sum(base) OVER ()")).cast("long"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("et"))))
        .withColumn("alloc",
          col("base") + when(col("rk") <= col("leftover"), 1L)
            .otherwise(0L))
      alloc.select(col("et"), col("n_h"), col("sd_cents"), col("w"),
        col("alloc"))
    }),

    // ---- q332: lead-lag regression between two daily series ------------
    // x = daily total event count, y = daily purchase revenue cents;
    // for each lag in −7..+7, regress y(day+lag) on x(day) over the
    // joined day frame: slope_micro = (nΣxy−ΣxΣy)·1e6 div (nΣxx−Σx²)
    // with DECIMAL(38,0) moments. The day frame is one corpus fold;
    // the 15-lag grid crossJoins that bounded frame, so the scan costs
    // 15 tiny regressions — the "which series moves first" readout.
    "q332_leadlag_regression" -> ((s, d) => {
      val daily = table(s, d, "events")
        .groupBy(expr("ts div 86400000000000").as("day"))
        .agg(count(lit(1)).as("x"),
          sum(expr("""CASE WHEN event_type = 'purchase'
              THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END"""))
            .as("y"))
      val lags = s.range(-7, 8).select(col("id").as("lag"))
      daily.select(col("day"), col("x"))
        .crossJoin(broadcast(lags))
        .join(daily.select(col("day").as("dj"), col("y")),
          col("dj") === col("day") + col("lag"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
          sum("y").as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .select(col("lag"), col("n_days"),
          expr("""CAST(
              (CAST(n_days AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
              div (CAST(n_days AS DECIMAL(38,0)) * sxx
                 - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""")
            .as("slope_micro"))
    }))

  val oracle: Map[String, String] = Map(
    "q331_neyman_allocation" ->
      """WITH st AS (
           SELECT event_type AS et, count(*) AS n_h,
             sum(CAST(floor(value * 100) AS BIGINT)) AS sx,
             sum(CAST(CAST(floor(value * 100) AS BIGINT) AS HUGEINT)
               * CAST(floor(value * 100) AS BIGINT)) AS sxx
           FROM events GROUP BY 1),
         v AS (
           SELECT et, n_h, sx,
             CAST((CAST(n_h AS HUGEINT) * sxx
               - CAST(sx AS HUGEINT) * sx)
               // (CAST(n_h AS HUGEINT) * n_h) AS BIGINT) AS var_c2
           FROM st),
         w AS (
           SELECT et, n_h,
             CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT)
               AS sd_cents,
             n_h * CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT)
               AS w
           FROM v),
         t AS (
           SELECT *, sum(w) OVER () AS tot_w,
             (1000 * w) // sum(w) OVER () AS base,
             (1000 * w) % sum(w) OVER () AS rem
           FROM w),
         r AS (
           SELECT *, 1000 - sum(base) OVER () AS leftover,
             row_number() OVER (ORDER BY rem DESC, et) AS rk
           FROM t)
         SELECT et, CAST(n_h AS BIGINT) AS n_h,
           CAST(sd_cents AS BIGINT) AS sd_cents, CAST(w AS BIGINT) AS w,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
             AS BIGINT) AS alloc
         FROM r""",

    "q332_leadlag_regression" ->
      """WITH daily AS (
           SELECT epoch_ns(ts) // 86400000000000 AS day,
             count(*) AS x,
             sum(CASE WHEN event_type = 'purchase'
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS y
           FROM events GROUP BY 1),
         lags AS (SELECT unnest(range(-7, 8)) AS lag),
         j AS (
           SELECT l.lag, a.x, b.y
           FROM daily a
           CROSS JOIN lags l
           JOIN daily b ON b.day = a.day + l.lag),
         m AS (
           SELECT lag, count(*) AS n_days, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy
           FROM j GROUP BY 1)
         SELECT CAST(lag AS BIGINT) AS lag,
           CAST(n_days AS BIGINT) AS n_days,
           CAST((CAST(n_days AS HUGEINT) * sxy
             - CAST(sx AS HUGEINT) * sy) * 1000000
             // (CAST(n_days AS HUGEINT) * sxx
                - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS slope_micro
         FROM m""")
}
