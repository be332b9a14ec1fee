package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 94: demand-shape diagnostics — the month-of-year
  * seasonal index per brand (merchandising's buy-plan input) and the
  * index-of-dispersion test on per-customer order counts (is demand
  * Poisson, or does it cluster — the assumption check behind every
  * Poisson-based capacity model).
  */
object Wave94Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q375: month-of-year seasonal index per brand --------------------
    // Quantity share of each calendar month within the brand vs the
    // uniform 1/12 in ppm: index_ppm = share_ppm·12 (1e6 = flat). One
    // fact fold to the 25×12 frame; window shares over that frame.
    "q375_brand_seasonal_index" -> ((s, d) => {
      table(s, d, "lineitem")
        .join(table(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"),
          month(expr("CAST(l_shipdate AS DATE)")).cast("long").as("moy"))
        .agg(sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("qty"))
        .withColumn("brand_qty",
          expr("sum(qty) OVER (PARTITION BY brand)"))
        .select(col("brand"), col("moy"), col("qty"),
          expr("qty * 1000000 div brand_qty").as("share_ppm"),
          expr("qty * 12000000 div brand_qty").as("index_ppm"))
    }),

    // ---- q376: index-of-dispersion (Poisson) test -------------------------
    // Per-customer order counts; dispersion = sample variance over
    // mean in ppm (DECIMAL moments, one exact division at the end).
    // 1e6 = Poisson; materially above = clustered demand (burstiness),
    // below = regular. One row out with the verdict string.
    "q376_dispersion_test" -> ((s, d) => {
      val counts = table(s, d, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).as("k"))
      counts.agg(count(lit(1)).as("n"), sum("k").as("sk"),
          sum(expr("CAST(k AS DECIMAL(38,0)) * k")).as("skk"))
        .select(col("n"), col("sk"),
          expr("sk * 1000000 div n").as("mean_micro"),
          expr("""CAST(
              (CAST(n AS DECIMAL(38,0)) * skk
               - CAST(sk AS DECIMAL(38,0)) * sk) * 1000000
              div (CAST(n AS DECIMAL(38,0)) * (n - 1) * sk div n)
              AS BIGINT)""").as("dispersion_ppm"))
        .withColumn("verdict", expr(
          """CASE WHEN dispersion_ppm > 1100000 THEN 'overdispersed'
                  WHEN dispersion_ppm < 900000 THEN 'underdispersed'
                  ELSE 'poisson_like' END"""))
    }))

  val oracle: Map[String, String] = Map(
    "q375_brand_seasonal_index" ->
      """WITH g AS (
           SELECT p_brand AS brand,
             CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) AS moy,
             sum(CAST(floor(l_quantity) AS BIGINT)) AS qty
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2)
         SELECT brand, moy, CAST(qty AS BIGINT) AS qty,
           CAST(qty * 1000000 // sum(qty) OVER (PARTITION BY brand)
             AS BIGINT) AS share_ppm,
           CAST(qty * 12000000 // sum(qty) OVER (PARTITION BY brand)
             AS BIGINT) AS index_ppm
         FROM g""",

    "q376_dispersion_test" ->
      """WITH counts AS (
           SELECT o_custkey AS ck, count(*) AS k
           FROM orders GROUP BY 1),
         m AS (
           SELECT count(*) AS n, sum(k) AS sk,
             sum(CAST(k AS HUGEINT) * k) AS skk
           FROM counts),
         r AS (
           SELECT CAST(n AS BIGINT) AS n, CAST(sk AS BIGINT) AS sk,
             CAST(sk * 1000000 // n AS BIGINT) AS mean_micro,
             CAST((CAST(n AS HUGEINT) * skk
                 - CAST(sk AS HUGEINT) * sk) * 1000000
               // (CAST(n AS HUGEINT) * (n - 1) * sk // n) AS BIGINT)
               AS dispersion_ppm
           FROM m)
         SELECT n, sk, mean_micro, dispersion_ppm,
           CASE WHEN dispersion_ppm > 1100000 THEN 'overdispersed'
                WHEN dispersion_ppm < 900000 THEN 'underdispersed'
                ELSE 'poisson_like' END AS verdict
         FROM r""")
}
