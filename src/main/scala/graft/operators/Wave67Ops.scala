package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 67: a bias-only recommender baseline evaluated under a
  * temporal split (the alternating-means model every collaborative
  * filter is benchmarked against) and a fact-vs-rollup reconciliation
  * histogram (does the order header total agree with its line items,
  * and by how much). Integer discipline throughout: ratings are exact
  * integers, every mean is one truncating division applied identically
  * in both engines, and the error distribution folds to a clamped
  * 21-bucket frame.
  */
object Wave67Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q321: bias-only recommender under a temporal split ------------
    // Rating = line quantity (exact 1..50 integer) for (customer,
    // part); train = first 80% of the order-date span, test = rest.
    // μ, then item bias b_i = mean(r − μ), then user bias
    // b_u = mean(r − μ − b_i) — two bounded alternating-means rounds,
    // each ONE key-partitioned aggregate (the bias frames are
    // key-sized, never corpus-sized; the scalar μ is a broadcast).
    // Prediction μ + b_i + b_u clamps to the rating domain; cold
    // items/users fall back to the available partial sum. One row out:
    // split sizes, μ, MAE in micro-rating units, cold counts.
    "q321_bias_recommender_mae" -> ((s, d) => {
      val r = table(s, d, "lineitem")
        .join(table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("i"),
          expr("CAST(floor(l_quantity) AS BIGINT)").as("r"),
          expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
            .as("dd"))
      val bounds = r.agg(min("dd").as("t0"), max("dd").as("t1"))
      val tagged = r.crossJoin(broadcast(bounds))
        .withColumn("late",
          expr("CAST(dd >= t0 + (t1 - t0) * 4 div 5 AS BIGINT)"))
        .select("u", "i", "r", "late")
      val train = tagged.filter(col("late") === 0)
      val test = tagged.filter(col("late") === 1)
      val muF = train.agg(count(lit(1)).as("n_train"),
        expr("sum(r) div count(1)").as("mu"))
      val trainMu = train.crossJoin(broadcast(muF))
      val bi = trainMu.groupBy("i")
        .agg(expr("sum(r - mu) div count(1)").as("b_i"))
      val bu = trainMu.join(bi, "i")
        .groupBy("u")
        .agg(expr("sum(r - mu - b_i) div count(1)").as("b_u"))
      test.crossJoin(broadcast(muF))
        .join(bi, Seq("i"), "left")
        .join(bu, Seq("u"), "left")
        .withColumn("pred", expr(
          """greatest(1, least(50,
               mu + coalesce(b_i, 0) + coalesce(b_u, 0)))"""))
        .agg(max("n_train").as("n_train"),
          count(lit(1)).as("n_test"),
          max("mu").as("mu"),
          expr("sum(abs(r - pred)) * 1000000 div count(1)")
            .as("mae_micro"),
          sum(expr("CAST(b_i IS NULL AS BIGINT)")).as("cold_item_rows"),
          sum(expr("CAST(b_u IS NULL AS BIGINT)")).as("cold_user_rows"))
    }),

    // ---- q322: order-header vs line-rollup reconciliation --------------
    // Per order: header cents vs Σ line extended-price cents; signed
    // relative error in ppm; clamped 10%-step buckets. One equi-join
    // shuffle on the order key, then a 21-row histogram with window
    // shares over that tiny frame. Headerless/lineless drift lands in
    // the extreme buckets (coalesce(0) makes absence a −100% error) —
    // the shape auditors actually want at reconciliation time.
    "q322_reconciliation_histogram" -> ((s, d) => {
      val lines = table(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("line_cents"))
      table(s, d, "orders")
        .select(col("o_orderkey").as("ok"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
            .as("total_cents"))
        .join(lines, Seq("ok"), "left")
        .withColumn("err_ppm", expr(
          "(coalesce(line_cents, 0) - total_cents) * 1000000 " +
            "div total_cents"))
        .withColumn("bucket",
          expr("greatest(-10, least(10, err_ppm div 100000))"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("err_ppm").as("min_err_ppm"),
          max("err_ppm").as("max_err_ppm"))
        .withColumn("share_ppm", expr("n * 1000000 div sum(n) OVER ()"))
    }))

  val oracle: Map[String, String] = Map(
    "q321_bias_recommender_mae" ->
      """WITH r AS (
           SELECT o_custkey AS u, l_partkey AS i,
             CAST(floor(l_quantity) AS BIGINT) AS r,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dd
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         b AS (SELECT min(dd) AS t0, max(dd) AS t1 FROM r),
         tagged AS (
           SELECT u, i, r.r,
             CASE WHEN dd >= t0 + (t1 - t0) * 4 // 5 THEN 1 ELSE 0 END
               AS late
           FROM r, b),
         train AS (SELECT * FROM tagged WHERE late = 0),
         test AS (SELECT * FROM tagged WHERE late = 1),
         muf AS (SELECT count(*) AS n_train, sum(r) // count(*) AS mu
                 FROM train),
         bi AS (SELECT i, sum(r - mu) // count(*) AS b_i
                FROM train, muf GROUP BY i),
         bu AS (SELECT u, sum(r - mu - b_i) // count(*) AS b_u
                FROM train JOIN bi USING (i), muf GROUP BY u),
         pred AS (
           SELECT test.r,
             greatest(1, least(50,
               mu + coalesce(b_i, 0) + coalesce(b_u, 0))) AS pred,
             CASE WHEN b_i IS NULL THEN 1 ELSE 0 END AS ci,
             CASE WHEN b_u IS NULL THEN 1 ELSE 0 END AS cu
           FROM test
           LEFT JOIN bi USING (i)
           LEFT JOIN bu USING (u), muf)
         SELECT CAST((SELECT n_train FROM muf) AS BIGINT) AS n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST((SELECT mu FROM muf) AS BIGINT) AS mu,
           CAST(sum(abs(r - pred)) * 1000000 // count(*) AS BIGINT)
             AS mae_micro,
           CAST(sum(ci) AS BIGINT) AS cold_item_rows,
           CAST(sum(cu) AS BIGINT) AS cold_user_rows
         FROM pred""",

    "q322_reconciliation_histogram" ->
      """WITH lines AS (
           SELECT l_orderkey AS ok,
             sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS line_cents
           FROM lineitem GROUP BY 1),
         e AS (
           SELECT (coalesce(line_cents, 0) - total_cents) * 1000000
               // total_cents AS err_ppm
           FROM (SELECT o_orderkey AS ok,
                   CAST(floor(o_totalprice * 100) AS BIGINT)
                     AS total_cents
                 FROM orders) o
           LEFT JOIN lines USING (ok)),
         g AS (
           SELECT greatest(-10, least(10, err_ppm // 100000)) AS bucket,
             count(*) AS n, min(err_ppm) AS min_err_ppm,
             max(err_ppm) AS max_err_ppm
           FROM e GROUP BY 1)
         SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n AS BIGINT) AS n,
           CAST(min_err_ppm AS BIGINT) AS min_err_ppm,
           CAST(max_err_ppm AS BIGINT) AS max_err_ppm,
           CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS share_ppm
         FROM g""")
}
