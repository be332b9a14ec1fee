package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 75: economic + linguistic scorecards — per-brand
  * price elasticity (log-log OLS of quantity on effective price, the
  * q316 micro-nat discipline, grouped) and a Flesch-style readability
  * scorecard per document source (vowel-group syllable proxy, exact
  * integer formula). Both are one corpus pass folding to small keyed
  * frames.
  */
object Wave75Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q337: per-brand price elasticity ------------------------------
    // Per line: x = ln(effective price cents) micro-nats (price cents
    // is an exact integer; the ln shape is pinned identically in both
    // engines), y = ln(quantity). Per brand: OLS slope in ppm — the
    // elasticity readout (negative slope = demand falls with price).
    // Moments ride DECIMAL(38,0)/HUGEINT (micro-nat products overflow
    // i64); one part-join (part is the dimension side) and one brand
    // aggregate.
    "q337_price_elasticity" -> ((s, d) => {
      val li = table(s, d, "lineitem")
        .join(table(s, d, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          expr("""CAST(floor(ln(1.0 * CAST(floor(
              l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              * 1000000) AS BIGINT)""").as("x"),
          expr("""CAST(floor(ln(1.0 * CAST(floor(l_quantity) AS BIGINT))
              * 1000000) AS BIGINT)""").as("y"))
      li.groupBy("brand")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .filter(col("n") >= 2)
        .select(col("brand"), col("n"),
          expr("""CAST(
              (CAST(n AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
              div (CAST(n AS DECIMAL(38,0)) * sxx
                 - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""")
            .as("elasticity_ppm"))
    }),

    // ---- q338: Flesch-style readability scorecard per source -----------
    // Sentences = non-empty '.'-separated spans; words = the corpus
    // tokenizer; syllable proxy = vowel groups per word (a-e-i-o-u
    // runs, ≥1 per word). Flesch micro = 206.835e6 − 1.015e6·words/
    // sentences − 84.6e6·syllables/words, with each ratio one
    // truncating integral division — deterministic in both engines.
    // One map-only pass folds to the |sources| frame.
    "q338_readability_scorecard" -> ((s, d) => {
      val perDoc = table(s, d, "documents")
        .select(col("source"),
          expr("""size(filter(split(text, '\\.'),
              x -> length(trim(x)) > 0))""").as("sents"),
          expr("""size(filter(split(lower(text), ' '),
              w -> w != ''))""").as("words"),
          expr("""aggregate(
              transform(filter(split(lower(text), ' '), w -> w != ''),
                w -> greatest(1, size(filter(
                  split(w, '[^aeiou]+'), g -> g != '')))),
              0L, (acc, v) -> acc + v)""").as("sylls"))
        .filter(col("sents") > 0 && col("words") > 0)
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("sents").as("sents"),
          sum("words").as("words"), sum("sylls").as("sylls"))
        .select(col("source"), col("n_docs"), col("sents"),
          col("words"), col("sylls"),
          expr("""206835000 - 1015000 * words div sents
              - 84600000 * sylls div words""").as("flesch_micro"))
    }))

  val oracle: Map[String, String] = Map(
    "q337_price_elasticity" ->
      """WITH li AS (
           SELECT p_brand AS brand,
             CAST(floor(ln(1.0 * CAST(floor(
               l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               * 1000000) AS BIGINT) AS x,
             CAST(floor(ln(1.0 * CAST(floor(l_quantity) AS BIGINT))
               * 1000000) AS BIGINT) AS y
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         m AS (
           SELECT brand, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy
           FROM li GROUP BY 1)
         SELECT brand, CAST(n AS BIGINT) AS n,
           CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
             * 1000000
             // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
             AS BIGINT) AS elasticity_ppm
         FROM m WHERE n >= 2""",

    "q338_readability_scorecard" ->
      """WITH perdoc AS (
           SELECT source,
             len(list_filter(string_split(text, '.'),
               x -> length(trim(x)) > 0)) AS sents,
             len(list_filter(string_split(lower(text), ' '),
               w -> w <> '')) AS words,
             list_sum(list_transform(
               list_filter(string_split(lower(text), ' '), w -> w <> ''),
               w -> greatest(1, len(list_filter(
                 regexp_split_to_array(w, '[^aeiou]+'), g -> g <> '')))))
               AS sylls
           FROM documents),
         g AS (
           SELECT source, count(*) AS n_docs, sum(sents) AS sents,
             sum(words) AS words, sum(sylls) AS sylls
           FROM perdoc WHERE sents > 0 AND words > 0
           GROUP BY 1)
         SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(sents AS BIGINT) AS sents,
           CAST(words AS BIGINT) AS words,
           CAST(sylls AS BIGINT) AS sylls,
           CAST(206835000 - 1015000 * words // sents
             - 84600000 * sylls // words AS BIGINT) AS flesch_micro
         FROM g""")
}
