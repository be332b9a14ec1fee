package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 43: the BI-report shapes every serving layer ends up
  * needing.
  *
  *   - q271 top-k with OTHERS: per-nation top-2 suppliers by exact
  *     revenue plus the residual bucket — the "top N + others" report.
  *   - q272 percent-of-parent hierarchy: nation revenue as ppm of its
  *     region, region as ppm of the grand total — the two-level
  *     drill-down rollup.
  */
object Wave43Ops {

  type Q = (SparkSession, String) => DataFrame

  private val Dec = org.apache.spark.sql.types.DecimalType(18, 2)

  /** Exact revenue in integer cents: DECIMAL(18,2) product summed,
    * then ×100 with an EXPLICIT floor — the product has scale 4, so
    * ×100 leaves a 2-digit fraction, and the engines' bare
    * decimal→long casts disagree on it (Spark truncates, DuckDB
    * rounds). floor() pins one semantic for both. No double ever
    * enters the aggregation. */
  private def revCents(price: org.apache.spark.sql.Column,
      disc: org.apache.spark.sql.Column) =
    floor(sum(price.cast(Dec) * (lit(1).cast(Dec) - disc.cast(Dec))) * 100)
      .cast("long")

  val queries: Map[String, Q] = Map(
    // ---- q271: per-nation top-2 suppliers + OTHERS ---------------------
    // One fact shuffle (lineitem ⋈ broadcast supplier, rolled up per
    // supplier), then ALL windows partition on the nation over
    // supplier-count-sized frames. The OTHERS bucket keeps the report
    // additive: per-nation shares sum to ~1e6 (floor division). Ties
    // break on s_suppkey so the cut is engine-deterministic.
    "q271_topk_others" -> ((s, d) => {
      val perSup = table(s, d, "lineitem")
        .join(broadcast(table(s, d, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey", "s_suppkey", "s_name")
        .agg(revCents(col("l_extendedprice"), col("l_discount"))
          .as("rev_cents"))
      val w = Window.partitionBy("s_nationkey")
        .orderBy(col("rev_cents").desc, col("s_suppkey"))
      val bucketed = perSup.withColumn("rn", row_number().over(w))
        .select(col("s_nationkey"),
          when(col("rn") <= 2, col("s_name")).otherwise(lit("OTHERS"))
            .as("entity"),
          col("rev_cents"))
        .groupBy("s_nationkey", "entity")
        .agg(sum("rev_cents").as("rev_cents"))
      bucketed
        .withColumn("share_ppm",
          expr("rev_cents * 1000000 div " +
            "sum(rev_cents) OVER (PARTITION BY s_nationkey)").cast("long"))
        .join(broadcast(table(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("entity"), col("rev_cents"),
          col("share_ppm"))
    }),

    // ---- q272: percent-of-parent hierarchy rollup ----------------------
    // The fact rolls up ONCE to nation grain; both share levels are
    // windows over the 25-row nation frame (region partition, then
    // global) — percent-of-parent never re-reads the corpus. Grand
    // total window is a documented SinglePartition over ≤ |nations|
    // rows.
    "q272_hierarchy_shares" -> ((s, d) => {
      val perNation = table(s, d, "lineitem")
        .join(broadcast(table(s, d, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(revCents(col("l_extendedprice"), col("l_discount"))
          .as("rev_cents"))
        .join(broadcast(table(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("rev_cents"))
      perNation
        .withColumn("nation_share_ppm",
          expr("rev_cents * 1000000 div " +
            "sum(rev_cents) OVER (PARTITION BY r_name)").cast("long"))
        .withColumn("region_share_ppm",
          expr("sum(rev_cents) OVER (PARTITION BY r_name) * 1000000 div " +
            "sum(rev_cents) OVER ()").cast("long"))
    }))

  val oracle: Map[String, String] = Map(
    "q271_topk_others" ->
      """WITH per_sup AS (
           SELECT s_nationkey, s_suppkey, s_name,
             CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 100)
               AS BIGINT) AS rev_cents
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           GROUP BY 1, 2, 3),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY s_nationkey
             ORDER BY rev_cents DESC, s_suppkey) AS rn
           FROM per_sup),
         bucketed AS (
           SELECT s_nationkey,
             CASE WHEN rn <= 2 THEN s_name ELSE 'OTHERS' END AS entity,
             CAST(sum(rev_cents) AS BIGINT) AS rev_cents
           FROM ranked GROUP BY 1, 2)
         SELECT n_name, entity, rev_cents,
           CAST(rev_cents * 1000000 // sum(rev_cents)
             OVER (PARTITION BY s_nationkey) AS BIGINT) AS share_ppm
         FROM bucketed JOIN nation ON s_nationkey = n_nationkey""",

    "q272_hierarchy_shares" ->
      """WITH per_nation AS (
           SELECT r_name, n_name,
             CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 100)
               AS BIGINT) AS rev_cents
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1, 2)
         SELECT r_name, n_name, rev_cents,
           CAST(rev_cents * 1000000 // sum(rev_cents)
             OVER (PARTITION BY r_name) AS BIGINT) AS nation_share_ppm,
           CAST(sum(rev_cents) OVER (PARTITION BY r_name) * 1000000
             // sum(rev_cents) OVER () AS BIGINT) AS region_share_ppm
         FROM per_nation""")
}
