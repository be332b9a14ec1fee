package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 29: data valuation.
  *
  *   - q243 leave-one-source-out (LOSO) contribution audit: for every
  *     source, what the corpus would look like WITHOUT it — the
  *     additive-metric form of data valuation (the decision input for
  *     "keep paying for this feed?"), plus each source's unique
  *     vocabulary contribution.
  */
object Wave29Ops {

  type Q = (SparkSession, String) => DataFrame

  private def words(c: Column): Column =
    filter(split(lower(c), " "), w => w =!= "")

  val queries: Map[String, Q] = Map(
    // ---- q243: leave-one-source-out contribution audit -----------------
    // Additive metrics make LOSO a SINGLE-PASS computation: the
    // without-s mean is (Σtok − Σtok_s) div (n − n_s) from one
    // per-source rollup + a 1-row corpus total broadcast — no
    // per-source corpus re-scan (the naive form is |sources|+1
    // passes). Unique-vocabulary contribution rides the q237/q131
    // content-keyed shape: distinct (token, source) pairs → tokens
    // with exactly one source → per-source count; tokens shuffle once.
    // delta_ppm > 0 ⇒ removing the source RAISES the corpus mean —
    // the source drags quality down; unique tokens measure what
    // coverage dies with it.
    "q243_loso_valuation" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("source"),
          size(words(col("text"))).cast("long").as("n_tok"))
      val per = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"))
      val tot = per.agg(sum("n_docs").as("t_docs"),
        sum("sum_tok").as("t_tok"))
      val uniq = table(s, d, "documents")
        .select(col("source"), explode(words(col("text"))).as("tok"))
        .distinct()
        .groupBy("tok")
        .agg(count(lit(1)).as("n_src"), min("source").as("only_src"))
        .filter(col("n_src") === 1)
        .groupBy(col("only_src").as("source"))
        .agg(count(lit(1)).as("uniq_tokens"))
      per.crossJoin(broadcast(tot))
        .join(uniq, Seq("source"), "left_outer")
        .na.fill(0L, Seq("uniq_tokens"))
        .select(col("source"), col("n_docs"), col("sum_tok"),
          expr("sum_tok div n_docs").as("mean_tok"),
          expr("(t_tok - sum_tok) div (t_docs - n_docs)")
            .as("loso_mean_tok"),
          expr("((t_tok - sum_tok) div (t_docs - n_docs)" +
            " - t_tok div t_docs) * 1000000L div (t_tok div t_docs)")
            .as("delta_ppm"),
          col("uniq_tokens"))
    }))

  val oracle: Map[String, String] = Map(
    "q243_loso_valuation" ->
      """WITH docs AS (
           SELECT source,
                  CAST(len(list_filter(string_split(lower(text), ' '),
                    w -> w <> '')) AS BIGINT) AS n_tok
           FROM documents),
         per AS (
           SELECT source, count(*) AS n_docs, sum(n_tok) AS sum_tok
           FROM docs GROUP BY 1),
         tot AS (
           SELECT sum(n_docs) AS t_docs, sum(sum_tok) AS t_tok FROM per),
         pairs AS (
           SELECT DISTINCT source,
                  unnest(list_filter(string_split(lower(text), ' '),
                    w -> w <> '')) AS tok
           FROM documents),
         uniq AS (
           SELECT source, count(*) AS uniq_tokens FROM (
             SELECT tok, count(*) AS n_src, min(source) AS source
             FROM pairs GROUP BY 1)
           WHERE n_src = 1 GROUP BY source),
         j AS (
           SELECT p.source, p.n_docs, p.sum_tok,
                  coalesce(u.uniq_tokens, 0) AS uniq_tokens,
                  t.t_docs, t.t_tok
           FROM per p CROSS JOIN tot t
           LEFT JOIN uniq u ON u.source = p.source)
         SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(sum_tok AS BIGINT) AS sum_tok,
                CAST(sum_tok // n_docs AS BIGINT) AS mean_tok,
                CAST((t_tok - sum_tok) // (t_docs - n_docs) AS BIGINT)
                  AS loso_mean_tok,
                CAST(((t_tok - sum_tok) // (t_docs - n_docs)
                      - t_tok // t_docs) * 1000000
                     // (t_tok // t_docs) AS BIGINT) AS delta_ppm,
                CAST(uniq_tokens AS BIGINT) AS uniq_tokens
         FROM j""")
}
