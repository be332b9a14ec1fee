package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.operators.TextOps.words

/** Round-6 wave 64: series diagnostics — CUSUM changepoint
  * localization over the daily revenue series and a Zipf-exponent fit
  * over the token frequency spectrum. Both follow the exact-integer
  * disciplines: the CUSUM statistic n·S_k − k·S_n never leaves
  * integers (DECIMAL(38,0)/HUGEINT for the products), and the log-log
  * OLS runs on micro-nat ln values with the q309 moment forms.
  */
object Wave64Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q315: CUSUM changepoint localization --------------------------
    // Daily revenue series (one corpus pass → ≤ a-few-thousand-row
    // day frame, domain-bounded, so the ordered cumsum window over it
    // is NOT a corpus-sized single partition). The changepoint
    // statistic D_k = n·S_k − k·S_n is the integer-exact form of
    // |mean-shift CUSUM|: argmax_k |D_k| splits the series where the
    // prefix mean diverges most from the global mean. Argmax via the
    // established struct-min recipe (earliest day wins ties); output
    // the split day, |D|, and the pre/post daily-mean cents.
    "q315_cusum_changepoint" -> ((s, d) => {
      val daily = table(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val cum = daily
        .withColumn("k", row_number().over(Window.orderBy("day")))
        .withColumn("s_k", sum("cents").over(
          Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = daily.agg(count(lit(1)).as("n"), sum("cents").as("s_n"))
      cum.crossJoin(broadcast(tot))
        .filter(col("k") < col("n"))
        .withColumn("d_abs", expr("""CAST(
            abs(CAST(n AS DECIMAL(38,0)) * s_k
              - CAST(k AS DECIMAL(38,0)) * s_n) AS BIGINT)"""))
        .agg(min(struct((-col("d_abs")).as("neg"), col("day"), col("k"),
          col("s_k"), col("n"), col("s_n"))).as("m"))
        .select(col("m.day").as("split_day"),
          col("m.k").cast("long").as("k_days"),
          (-col("m.neg")).as("d_abs"),
          expr("m.s_k div m.k").as("pre_mean_cents"),
          expr("(m.s_n - m.s_k) div (m.n - m.k)").as("post_mean_cents"))
    }),

    // ---- q316: Zipf exponent of the token frequency spectrum -----------
    // Token counts (the q99 tokenize chain), top-200 ranks (vocab-sized
    // window — the q93 two-phase rank replaces it at real vocab scale),
    // then OLS of ln(freq) on ln(rank) in micro-nats: slope_ppm ≈ −1e6
    // for natural text. Moments lifted to DECIMAL(38,0) (HUGEINT in the
    // oracle) because n·Σxy − Σx·Σy overflows i64 at micro-nat scale;
    // one final exact integral division per statistic.
    "q316_zipf_exponent" -> ((s, d) => {
      val freq = table(s, d, "documents")
        .select(explode(words(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val top = freq
        .withColumn("r", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))))
        .filter(col("r") <= 200)
        .select(
          expr("CAST(floor(ln(1.0 * r) * 1000000) AS BIGINT)").as("x"),
          expr("CAST(floor(ln(1.0 * cnt) * 1000000) AS BIGINT)").as("y"),
          col("cnt"))
      top.agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
          max("cnt").as("top_cnt"))
        .select(col("n").as("n_terms"),
          expr("""CAST(
            (CAST(n AS DECIMAL(38,0)) * sxy
             - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
            div (CAST(n AS DECIMAL(38,0)) * sxx
               - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""")
            .as("slope_ppm"),
          expr("""CAST(
            (CAST(n AS DECIMAL(38,0)) * sxy
             - CAST(sx AS DECIMAL(38,0)) * sy)
            * (CAST(n AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
            div ((CAST(n AS DECIMAL(38,0)) * sxx
                - CAST(sx AS DECIMAL(38,0)) * sx)
               * (CAST(n AS DECIMAL(38,0)) * syy
                  - CAST(sy AS DECIMAL(38,0)) * sy)) AS BIGINT)""")
            .as("r2_ppm"),
          col("top_cnt"))
    }))

  val oracle: Map[String, String] = Map(
    "q315_cusum_changepoint" ->
      """WITH daily AS (
           SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1),
         cum AS (
           SELECT day,
             row_number() OVER (ORDER BY day) AS k,
             sum(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_k
           FROM daily),
         tot AS (SELECT count(*) AS n, sum(cents) AS s_n FROM daily),
         scored AS (
           SELECT day, k, s_k, n, s_n,
             CAST(abs(CAST(n AS HUGEINT) * s_k
               - CAST(k AS HUGEINT) * s_n) AS BIGINT) AS d_abs
           FROM cum, tot WHERE k < n),
         best AS (
           SELECT *, row_number() OVER (ORDER BY d_abs DESC, day) AS rn
           FROM scored)
         SELECT day AS split_day, CAST(k AS BIGINT) AS k_days, d_abs,
           CAST(s_k // k AS BIGINT) AS pre_mean_cents,
           CAST((s_n - s_k) // (n - k) AS BIGINT) AS post_mean_cents
         FROM best WHERE rn = 1""",

    "q316_zipf_exponent" ->
      """WITH toks AS (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
             w -> w <> '')) AS tok
           FROM documents),
         freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         ranked AS (
           SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS r
           FROM freq),
         top AS (
           SELECT
             CAST(floor(ln(1.0 * r) * 1000000) AS BIGINT) AS x,
             CAST(floor(ln(1.0 * cnt) * 1000000) AS BIGINT) AS y,
             cnt
           FROM ranked WHERE r <= 200),
         m AS (
           SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             max(cnt) AS top_cnt
           FROM top)
         SELECT CAST(n AS BIGINT) AS n_terms,
           CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
             * 1000000
             // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
             AS BIGINT) AS slope_ppm,
           CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
             * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
             * 1000000
             // ((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                * (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy))
             AS BIGINT) AS r2_ppm,
           CAST(top_cnt AS BIGINT) AS top_cnt
         FROM m""")
}
