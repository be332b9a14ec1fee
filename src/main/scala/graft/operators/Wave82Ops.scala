package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.operators.TextOps.words

/** Round-6 wave 82: estimator audits — Chao1 vocabulary richness (how
  * many distinct tokens exist beyond what the sample shows, from the
  * singleton/doubleton counts alone) and a join-cardinality estimator
  * audit (the optimizer's uniform-frequency assumption vs the exact
  * self-join size, per key bucket — where the estimate blows up is
  * exactly where a skew-aware plan is needed).
  */
object Wave82Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q351: Chao1 vocabulary-richness estimate -----------------------
    // From the token frequency-of-frequencies: D observed types, f1
    // singletons, f2 doubletons → Chao1 = D + f1² div (2·f2); the
    // Good–Turing unseen-mass P₀ = f1/N rides along in ppm. Two
    // corpus folds (token counts → count-of-counts), everything else
    // scalar. The "how much more vocab will 10× data buy" readout.
    "q351_chao1_vocab" -> ((s, d) => {
      val freq = table(s, d, "documents")
        .select(explode(words(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      freq.agg(
          count(lit(1)).as("d_types"),
          sum("c").as("n_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
        .select(col("d_types"), col("n_tokens"), col("f1"), col("f2"),
          expr("d_types + (f1 * f1) div (2 * greatest(1, f2))")
            .as("chao1"),
          expr("f1 * 1000000 div n_tokens").as("unseen_mass_ppm"))
    }),

    // ---- q352: join-cardinality estimator audit --------------------------
    // Keys hash into 16 buckets; per bucket the optimizer's
    // uniform-frequency self-join estimate n² div d is audited against
    // the exact Σf² (both from ONE frequency fold — the actual
    // self-join is never materialized). err_ppm > 0 everywhere
    // (Cauchy–Schwarz); the hot buckets are the skew the q298 salt
    // advisor would treat. The estimator-vs-truth shape every
    // cost-based planner should be able to run on its own data.
    "q352_join_card_audit" -> ((s, d) => {
      val f = table(s, d, "lineitem")
        .groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).as("c"))
        .withColumn("bucket", expr("k % 16"))
      f.groupBy("bucket")
        .agg(sum("c").as("n_rows"),
          count(lit(1)).as("d_keys"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("long")
            .as("actual_selfjoin"))
        .select(col("bucket"), col("n_rows"), col("d_keys"),
          expr("""CAST((CAST(n_rows AS DECIMAL(38,0)) * n_rows)
              div d_keys AS BIGINT)""").as("est_selfjoin"),
          col("actual_selfjoin"),
          expr("""CAST(((CAST(n_rows AS DECIMAL(38,0)) * n_rows)
              div d_keys - actual_selfjoin)
              * 1000000 div actual_selfjoin AS BIGINT)""").as("err_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q351_chao1_vocab" ->
      """WITH toks AS (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
             w -> w <> '')) AS tok
           FROM documents),
         freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
         m AS (
           SELECT count(*) AS d_types, sum(c) AS n_tokens,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
             sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
           FROM freq)
         SELECT CAST(d_types AS BIGINT) AS d_types,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
           CAST(d_types + (f1 * f1) // (2 * greatest(1, f2)) AS BIGINT)
             AS chao1,
           CAST(f1 * 1000000 // n_tokens AS BIGINT) AS unseen_mass_ppm
         FROM m""",

    "q352_join_card_audit" ->
      """WITH f AS (
           SELECT l_partkey AS k, count(*) AS c
           FROM lineitem GROUP BY 1),
         b AS (
           SELECT k % 16 AS bucket, sum(c) AS n_rows,
             count(*) AS d_keys,
             CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS actual_selfjoin
           FROM f GROUP BY 1)
         SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(d_keys AS BIGINT) AS d_keys,
           CAST((CAST(n_rows AS HUGEINT) * n_rows) // d_keys AS BIGINT)
             AS est_selfjoin,
           CAST(actual_selfjoin AS BIGINT) AS actual_selfjoin,
           CAST(((CAST(n_rows AS HUGEINT) * n_rows) // d_keys
             - actual_selfjoin)
             * 1000000 // actual_selfjoin AS BIGINT) AS err_ppm
         FROM b""")
}
