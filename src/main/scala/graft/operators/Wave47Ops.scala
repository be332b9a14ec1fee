package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 47: inequality measurement.
  *
  * q279 per-nation Gini coefficient of customer order spend — the
  * standard single-number concentration metric (data-mixture skew,
  * revenue concentration, token-ownership inequality all reduce to
  * it), exact in integer ppm via the rank formulation
  * G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx).
  */
object Wave47Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q279: Gini coefficient by nation -------------------------------
    // The corpus reduces to per-customer cents FIRST (one fact
    // shuffle); the rank window then partitions on the nation over
    // customer-count-sized frames (q134's per-group rank shape; the
    // two-phase distributed rank replaces it at planetary customer
    // counts). All integer arithmetic — numerator and denominator are
    // exact, gini_ppm is one floor division. Ties rank by (cents,
    // custkey), which leaves the SUM Σi·x_(i) invariant across any
    // tie permutation of equal x values.
    "q279_gini_by_nation" -> ((s, d) => {
      val perCust = table(s, d, "orders")
        .join(broadcast(table(s, d, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(floor(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("cents"), col("c_custkey"))
      perCust.withColumn("i", row_number().over(w).cast("long"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
          sum("cents").as("total_cents"),
          sum(expr("i * cents")).as("ranked_sum"))
        .join(broadcast(table(s, d, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("n_customers"), col("total_cents"),
          // divide by n FIRST: numerator·1e6 overflows long at sf0.1
          // already. The numerator is ≥ 0 (sorted-rank identity), so
          // Spark's truncating div and DuckDB's floor // agree; the
          // staged division costs < 1 ppm. (At planetary n·cents,
          // move the whole expression to DECIMAL(38).)
          expr("""((2 * ranked_sum - (n_customers + 1) * total_cents)
                  div n_customers) * 1000000 div total_cents""")
            .as("gini_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q279_gini_by_nation" ->
      """WITH per_cust AS (
           SELECT c_nationkey, c_custkey,
             CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100)
               AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         ranked AS (
           SELECT c_nationkey, cents,
             CAST(row_number() OVER (PARTITION BY c_nationkey
               ORDER BY cents, c_custkey) AS BIGINT) AS i
           FROM per_cust),
         g AS (
           SELECT c_nationkey, count(*) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(sum(i * cents) AS BIGINT) AS ranked_sum
           FROM ranked GROUP BY 1)
         SELECT n_name, n_customers, total_cents,
           ((2 * ranked_sum - (n_customers + 1) * total_cents)
             // n_customers) * 1000000 // total_cents AS gini_ppm
         FROM g JOIN nation ON c_nationkey = n_nationkey""")
}
