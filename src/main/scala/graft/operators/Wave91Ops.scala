package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 91: risk-aware rankings and payment forensics — the
  * "sort by lower confidence bound" return-rate ranking (a raw rate
  * over 10 lines is noise; the LCB makes small-n brands rank
  * honestly) and a recurring similar-payment scan (same customer,
  * same amount band — the accounts-payable audit classic, blocked so
  * it scales).
  */
object Wave91Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q369: return-rate ranking with a lower confidence bound --------
    // Per brand: returned lines / total lines; Wald LCB at 95%:
    // lcb_ppm = p_ppm − 1960·⌊√(p_ppm·(1e6−p_ppm) div n)⌋ div 1000,
    // clamped at 0. The sqrt argument is an exact integer < 2⁵³ so the
    // double sqrt+floor is deterministic in both engines (the q331
    // isqrt discipline). One fact fold to the brand frame.
    "q369_return_rate_lcb" -> ((s, d) => {
      table(s, d, "lineitem")
        .join(table(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(expr("CAST(l_returnflag = 'R' AS BIGINT)")).as("n_ret"))
        .withColumn("rate_ppm", expr("n_ret * 1000000 div n_lines"))
        .withColumn("lcb_ppm", expr(
          """greatest(0, rate_ppm
             - 1960 * CAST(floor(sqrt(CAST(
                 rate_ppm * (1000000 - rate_ppm) div n_lines
               AS DOUBLE))) AS BIGINT) div 1000)"""))
        .select(col("brand"), col("n_lines"), col("n_ret"),
          col("rate_ppm"), col("lcb_ppm"))
    }),

    // ---- q370: recurring similar-payment scan ----------------------------
    // Candidate pairs block on the (customer, $1000 amount band) key —
    // the coarse key is what makes the scan scale (pair explosion is
    // bounded by per-(customer, band) multiplicity); the gap between
    // the two order dates buckets into years. Same-band repeat
    // payments by one account are what an AP auditor triages first.
    "q370_duplicate_payment_scan" -> ((s, d) => {
      val o = table(s, d, "orders").select(
        col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT) div 100000")
          .as("band"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
          .cast("long").as("dd"))
      val pairs = o.select(col("ck"), col("band"),
          col("ok").as("ok1"), col("dd").as("d1"))
        .join(o.select(col("ck"), col("band"), col("ok").as("ok2"),
          col("dd").as("d2")), Seq("ck", "band"))
        .filter(col("ok1") < col("ok2"))
      pairs
        .groupBy(expr("abs(d1 - d2) div 365").as("gap_years"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("ck")).as("n_customers"))
    }))

  val oracle: Map[String, String] = Map(
    "q369_return_rate_lcb" ->
      """WITH g AS (
           SELECT p_brand AS brand, count(*) AS n_lines,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS n_ret
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1),
         r AS (
           SELECT *, n_ret * 1000000 // n_lines AS rate_ppm FROM g)
         SELECT brand, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_ret AS BIGINT) AS n_ret,
           CAST(rate_ppm AS BIGINT) AS rate_ppm,
           CAST(greatest(0, rate_ppm
             - 1960 * CAST(floor(sqrt(CAST(
                 rate_ppm * (1000000 - rate_ppm) // n_lines
               AS DOUBLE))) AS BIGINT) // 1000) AS BIGINT) AS lcb_ppm
         FROM r""",

    "q370_duplicate_payment_scan" ->
      """WITH o AS (
           SELECT o_orderkey AS ok, o_custkey AS ck,
             CAST(floor(o_totalprice * 100) AS BIGINT) // 100000
               AS band,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
               AS BIGINT) AS dd
           FROM orders),
         pairs AS (
           SELECT a.ck, abs(a.dd - b.dd) // 365 AS gap_years
           FROM o a JOIN o b
             ON a.ck = b.ck AND a.band = b.band AND a.ok < b.ok)
         SELECT CAST(gap_years AS BIGINT) AS gap_years,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT ck) AS BIGINT) AS n_customers
         FROM pairs GROUP BY 1""")
}
