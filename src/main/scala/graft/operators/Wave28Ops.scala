package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 28: association mining.
  *
  *   - q242 frequent co-purchase pairs (A-priori 2-itemsets): support
  *     and lift for part pairs co-occurring in orders — the
  *     market-basket shape, with the A-priori pruning step that makes
  *     it survive corpus scale.
  */
object Wave28Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q242: frequent co-purchase pairs + lift -----------------------
    // The A-priori trick IS the scale story: items are counted first
    // (one map-side-combined shuffle) and only FREQUENT items (≥3
    // baskets) enter pair generation, so each basket's pair explosion
    // is bounded by its frequent-item count choose 2 — per-row array
    // lambdas over the sorted basket list, then ONE shuffle keyed on
    // the pair. The naive alternative (basket self-join, which the
    // DuckDB oracle runs) is quadratic in basket size with no pruning.
    // Lift in integer ppm: support·N·1e6 div (n_a·n_b), the
    // association strength downstream ranking uses.
    "q242_copurchase_pairs" -> ((s, d) => {
      val op = table(s, d, "lineitem")
        .select(col("l_orderkey").as("ord"), col("l_partkey").as("part"))
        .distinct()
      val cnt = op.groupBy("part").agg(count(lit(1)).as("n"))
      val freq = cnt.filter(col("n") >= 3)
      val baskets = op.join(freq.select("part"), "part")
        .groupBy("ord")
        .agg(sort_array(collect_list(col("part"))).as("items"))
        .filter(size(col("items")) >= 2)
      val pairs = baskets.select(explode(expr(
        """flatten(transform(sequence(0, size(items) - 2), i ->
             transform(sequence(i + 1, size(items) - 1), j ->
               struct(items[i] AS a, items[j] AS b))))""")).as("p"))
        .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
      val tot = op.select("ord").distinct().agg(count(lit(1))
        .as("n_orders"))
      pairs
        .join(freq.select(col("part").as("part_a"), col("n").as("n_a")),
          "part_a")
        .join(freq.select(col("part").as("part_b"), col("n").as("n_b")),
          "part_b")
        .crossJoin(broadcast(tot))
        .select(col("part_a"), col("part_b"), col("support"),
          col("n_a"), col("n_b"),
          expr("support * n_orders * 1000000L div (n_a * n_b)")
            .as("lift_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q242_copurchase_pairs" ->
      """WITH op AS (
           SELECT DISTINCT l_orderkey AS ord, l_partkey AS part
           FROM lineitem),
         cnt AS (SELECT part, count(*) AS n FROM op GROUP BY 1),
         freq AS (SELECT part, n FROM cnt WHERE n >= 3),
         fo AS (SELECT ord, part FROM op JOIN freq USING (part)),
         pairs AS (
           SELECT a.part AS part_a, b.part AS part_b,
                  count(*) AS support
           FROM fo a JOIN fo b ON a.ord = b.ord AND a.part < b.part
           GROUP BY 1, 2 HAVING count(*) >= 2),
         tot AS (SELECT count(DISTINCT ord) AS n_orders FROM op)
         SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
                CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
                CAST(support * n_orders * 1000000
                     // (ca.n * cb.n) AS BIGINT) AS lift_ppm
         FROM pairs
         JOIN freq ca ON ca.part = part_a
         JOIN freq cb ON cb.part = part_b
         CROSS JOIN tot""")
}
