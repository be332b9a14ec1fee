package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 50: label-noise auditing, forecast-calibration
  * decomposition, the third leg of the privacy triad, and conformal
  * coverage — four evaluation/curation operators a training-data
  * pipeline runs over its scored corpus.
  *
  *   - q282 nearest-centroid confusion matrix: the standard cheap
  *     label-noise screen over an embedded corpus (cf. confident
  *     learning): assign every vector to its nearest class centroid
  *     and tabulate true-label × predicted-label counts.
  *   - q283 Brier-score decomposition (Murphy 1973): reliability /
  *     resolution terms per forecast bin, exact in integer ppm.
  *   - q284 t-closeness (Li et al. 2007), completing k-anonymity
  *     (q155) and l-diversity (q206): per quasi-identifier group, the
  *     ordered-EMD distance between the group's sensitive-value
  *     distribution and the global one.
  *   - q285 split-conformal coverage: calibration-half residual
  *     quantile, test-half coverage — the distribution-free interval
  *     guarantee audit.
  */
object Wave50Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Sequential double dot product of two ARRAY<DOUBLE> columns —
    * matches DuckDB's list_dot_product accumulation order
    * (VectorOps contract). */
  private def dotD(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> x * y),
        CAST(0 AS DOUBLE), (acc, t) -> acc + t)""")

  /** (cents, pos) scoring frame shared with the wave-22 rank metrics:
    * the value in exact cents is the "model score", purchase is the
    * positive label. */
  private def scored(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").select(
      expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
      expr("CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END " +
        "AS BIGINT)").as("pos"))

  val queries: Map[String, Q] = Map(
    // ---- q282: nearest-centroid confusion matrix (label-noise audit) --
    // Centroids are per-label cell means rounded to 6 dp (q104's exact
    // recipe, so Spark's sequential-double accumulation matches the
    // oracle bit-for-bit). Every vector scores against ALL centroids
    // via a broadcast of the P-row centroid frame — the q85 k-means
    // shape: the corpus stays map-only through scoring (P·n scored
    // rows never shuffle; the argmin is a map-side-combinable min of
    // struct(dist, label)), then one tiny shuffle on the P×P confusion
    // key. v·v is constant within a vector so the score drops it:
    // score = c·c − 2 v·c orders identically to squared distance.
    "q282_centroid_confusion" -> ((s, d) => {
      val e = table(s, d, "embeddings").select(col("vec_id"),
        col("label").cast("long").as("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val cents = e
        .select(col("label").as("clabel"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("clabel", "pos").agg(round(avg("x"), 6).as("c"))
        .groupBy("clabel")
        .agg(expr(
          "transform(sort_array(collect_list(struct(pos, c))), p -> p.c)")
          .as("cvec"))
      val pred = e.crossJoin(broadcast(cents))
        .withColumn("score",
          round(dotD("cvec", "cvec") - lit(2) * dotD("v", "cvec"), 6))
        .groupBy("vec_id", "label")
        .agg(min(struct(col("score"), col("clabel"))).as("m"))
        .select(col("label"), col("m.clabel").as("pred_label"))
      pred.groupBy("label", "pred_label").agg(count(lit(1)).as("n"))
        .withColumn("row_ppm",
          expr("n * 1000000 div sum(n) OVER (PARTITION BY label)")
            .cast("long"))
    }),

    // ---- q283: Brier decomposition (reliability / resolution) ---------
    // Forecast p = cents/(m+1) in ppm; 10 forecast bins (q230's edges).
    // Per bin k: n_k, p̄_k, ō_k and the Murphy terms
    //   rel_k = n_k(p̄_k−ō_k)²/N,  res_k = n_k(ō_k−ō)²/N
    // reported in ppm of the (ppm²-scaled) Brier units, all integer
    // division so both engines agree exactly. One histogram shuffle
    // (10 partials, map-side combined) + two 1-row broadcast scalars.
    // i64 headroom: (1e6)²·n_k needs n_k < 9.2e6·1e6/1e12 ≈ 9e6 per
    // bin per partial — the global agg is on the 10-row bin frame, so
    // the product is computed once per bin on already-summed counts;
    // at ≥1e13-row corpora rescale the ppm unit first (documented).
    "q283_brier_decomposition" -> ((s, d) => {
      val ev = scored(s, d)
      val mx = ev.agg(max("cents").as("m"))
      val tot = ev.agg(count(lit(1)).as("n_all"), sum("pos").as("pos_all"))
      val g = ev.crossJoin(broadcast(mx))
        .select(expr("cents div (m div 10 + 1)").as("bin"),
          expr("cents * 1000000 div (m + 1)").as("p_ppm"), col("pos"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
          sum("p_ppm").as("sum_p"))
      g.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"),
          expr("sum_p div n").as("pbar_ppm"),
          expr("n_pos * 1000000 div n").as("obar_ppm"),
          expr("""n * (sum_p div n - n_pos * 1000000 div n)
                    * (sum_p div n - n_pos * 1000000 div n)
                  div (n_all * 1000000)""").as("rel_ppm"),
          expr("""n * (n_pos * 1000000 div n - pos_all * 1000000 div n_all)
                    * (n_pos * 1000000 div n - pos_all * 1000000 div n_all)
                  div (n_all * 1000000)""").as("res_ppm"))
    }),

    // ---- q284: t-closeness over (event_type, day-of-week) QI groups ---
    // Sensitive attribute = the spend decile class (q230's global bin
    // edges — shared constants, so group and global distributions are
    // comparable). For an ORDERED attribute the EMD reduces to
    // Σ|cumulative difference|/(C−1) (Li et al. §3): per group, the
    // per-class ppm shares diff against the global shares, cumulate
    // over the 11-class grid (made gapless via group × range(0,11) so
    // an empty class still carries the running difference), and sum
    // absolute values. Work: one (group, class) histogram shuffle +
    // windows over ≤11-row partitions; the grid is |groups|·11 rows —
    // tiny at any corpus size because groups are (type × dow) ≤ 35.
    "q284_t_closeness" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_type"),
          expr("(ts div 86400000000000 + 4) % 7").as("dow"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val mx = ev.agg(max("cents").as("m"))
      val cls = ev.crossJoin(broadcast(mx))
        .select(col("event_type"), col("dow"),
          expr("cents div (m div 10 + 1)").as("cls"))
      val byGrpCls = cls.groupBy("event_type", "dow", "cls")
        .agg(count(lit(1)).as("n"))
      val byGrp = byGrpCls.groupBy("event_type", "dow")
        .agg(sum("n").as("n_g"))
      val byCls = byGrpCls.groupBy("cls").agg(sum("n").as("n_c"))
      val tot = byCls.agg(sum("n_c").as("n_all"))
      val grid = byGrp.crossJoin(s.range(0, 11).select(col("id").as("cls")))
      val w = Window.partitionBy("event_type", "dow").orderBy("cls")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .join(byGrpCls, Seq("event_type", "dow", "cls"), "left_outer")
        .na.fill(0L, Seq("n"))
        .join(broadcast(byCls), Seq("cls"), "left_outer")
        .na.fill(0L, Seq("n_c"))
        .crossJoin(broadcast(tot))
        .withColumn("diff_ppm",
          expr("n * 1000000 div n_g - n_c * 1000000 div n_all"))
        .withColumn("cum", sum("diff_ppm").over(w))
        .groupBy("event_type", "dow")
        .agg(max("n_g").as("n_g"),
          expr("sum(abs(cum)) div 10").as("t_ppm"))
    }),

    // ---- q285: split-conformal coverage audit -------------------------
    // Deterministic md5 split (the q273 hash family): half calibrates,
    // half tests. Point prediction = per-type floor-mean cents from
    // the calibration half; nonconformity = |cents − pred|. q̂ is the
    // ⌈0.9(n+1)⌉-th smallest calibration residual — an EXACT order
    // statistic found on the distinct-residual histogram (value domain
    // ≤ the cents domain, so the cumulative window runs over a
    // domain-bounded frame, never the corpus — the q181 exact-median
    // discipline). Coverage = share of test rows within q̂, per type
    // and overall (rollup). Conformal guarantees ≥ 90% marginal
    // coverage; the audit verifies it empirically in exact ppm.
    "q285_conformal_coverage" -> ((s, d) => {
      val ev = table(s, d, "events").select(col("event_id"),
        col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
        expr("""CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 13),
             16, 10) AS BIGINT) % 2""").as("half"))
      val cal = ev.filter(col("half") === 0)
      val test = ev.filter(col("half") === 1)
      val pred = cal.groupBy("event_type")
        .agg(expr("sum(cents) div count(1)").as("pred"))
      val resid = cal.join(broadcast(pred), "event_type")
        .select(abs(col("cents") - col("pred")).as("r"))
      val kRow = resid.agg(
        expr("(9 * (count(1) + 1) + 9) div 10").as("k"))
      val wr = Window.orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val qhat = resid.groupBy("r").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(wr))
        .crossJoin(broadcast(kRow))
        .filter(col("cum") >= col("k"))
        .agg(min("r").as("qhat"))
      test.join(broadcast(pred), "event_type")
        .crossJoin(broadcast(qhat))
        .withColumn("cov",
          expr("CAST(abs(cents - pred) <= qhat AS BIGINT)"))
        .rollup(col("event_type"))
        .agg(count(lit(1)).as("n_test"), sum("cov").as("n_covered"),
          expr("sum(cov) * 1000000 div count(1)").as("coverage_ppm"))
        .select(coalesce(col("event_type"), lit("__all__"))
          .as("event_type"),
          col("n_test"), col("n_covered"), col("coverage_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q282_centroid_confusion" ->
      """WITH e AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         cent AS (
           SELECT clabel, list(c ORDER BY pos) AS cvec FROM (
             SELECT CAST(label AS BIGINT) AS clabel, i AS pos,
                    round(avg(x), 6) AS c
             FROM (SELECT label,
                     unnest(range(1, len(embedding) + 1)) AS i,
                     unnest(CAST(embedding AS DOUBLE[])) AS x
                   FROM embeddings)
             GROUP BY 1, 2)
           GROUP BY clabel),
         sc AS (
           SELECT e.vec_id, e.label, c.clabel,
             round(list_dot_product(c.cvec, c.cvec)
                   - 2 * list_dot_product(e.v, c.cvec), 6) AS score
           FROM e CROSS JOIN cent c),
         p AS (
           SELECT label, clabel AS pred_label FROM (
             SELECT label, clabel, row_number() OVER (
               PARTITION BY vec_id ORDER BY score ASC, clabel ASC) AS rn
             FROM sc)
           WHERE rn = 1),
         g AS (SELECT label, pred_label, count(*) AS n
               FROM p GROUP BY 1, 2)
         SELECT label, pred_label, CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // sum(n) OVER (PARTITION BY label)
             AS BIGINT) AS row_ppm
         FROM g""",

    "q283_brier_decomposition" ->
      """WITH ev AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
                  CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS BIGINT) AS pos
           FROM events),
         mx AS (SELECT max(cents) AS m FROM ev),
         tot AS (SELECT count(*) AS n_all, sum(pos) AS pos_all FROM ev),
         g AS (
           SELECT cents // (m // 10 + 1) AS bin, count(*) AS n,
                  sum(pos) AS n_pos,
                  sum(cents * 1000000 // (m + 1)) AS sum_p
           FROM ev, mx GROUP BY 1)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
           CAST(sum_p // n AS BIGINT) AS pbar_ppm,
           CAST(n_pos * 1000000 // n AS BIGINT) AS obar_ppm,
           CAST(n * (sum_p // n - n_pos * 1000000 // n)
                  * (sum_p // n - n_pos * 1000000 // n)
                // (n_all * 1000000) AS BIGINT) AS rel_ppm,
           CAST(n * (n_pos * 1000000 // n - pos_all * 1000000 // n_all)
                  * (n_pos * 1000000 // n - pos_all * 1000000 // n_all)
                // (n_all * 1000000) AS BIGINT) AS res_ppm
         FROM g, tot""",

    "q284_t_closeness" ->
      """WITH ev AS (
           SELECT event_type,
                  (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         mx AS (SELECT max(cents) AS m FROM ev),
         c AS (SELECT event_type, dow, cents // (m // 10 + 1) AS cls
               FROM ev, mx),
         bgc AS (SELECT event_type, dow, cls, count(*) AS n
                 FROM c GROUP BY 1, 2, 3),
         bg AS (SELECT event_type, dow, sum(n) AS n_g
                FROM bgc GROUP BY 1, 2),
         bc AS (SELECT cls, sum(n) AS n_c FROM bgc GROUP BY 1),
         tot AS (SELECT sum(n_c) AS n_all FROM bc),
         grid AS (
           SELECT bg.event_type, bg.dow, bg.n_g, t.cls
           FROM bg CROSS JOIN (SELECT unnest(range(0, 11)) AS cls) t),
         j AS (
           SELECT g.event_type, g.dow, g.n_g, g.cls,
             coalesce(bgc.n, 0) AS n, coalesce(bc.n_c, 0) AS n_c
           FROM grid g
           LEFT JOIN bgc ON g.event_type = bgc.event_type
             AND g.dow = bgc.dow AND g.cls = bgc.cls
           LEFT JOIN bc ON g.cls = bc.cls),
         cum AS (
           SELECT event_type, dow, n_g,
             sum(n * 1000000 // n_g - n_c * 1000000 // n_all) OVER (
               PARTITION BY event_type, dow ORDER BY cls
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM j, tot)
         SELECT event_type, CAST(dow AS BIGINT) AS dow,
           CAST(max(n_g) AS BIGINT) AS n_g,
           CAST(sum(abs(cum)) // 10 AS BIGINT) AS t_ppm
         FROM cum GROUP BY 1, 2""",

    "q285_conformal_coverage" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13))
               AS BIGINT) % 2 AS half
           FROM events),
         pred AS (
           SELECT event_type, sum(cents) // count(*) AS pred
           FROM ev WHERE half = 0 GROUP BY 1),
         resid AS (
           SELECT abs(e.cents - p.pred) AS r
           FROM ev e JOIN pred p ON e.event_type = p.event_type
           WHERE e.half = 0),
         k AS (SELECT (9 * (count(*) + 1) + 9) // 10 AS k FROM resid),
         hist AS (
           SELECT r, sum(count(*)) OVER (ORDER BY r
             ROWS UNBOUNDED PRECEDING) AS cum
           FROM resid GROUP BY r),
         qhat AS (SELECT min(r) AS qhat FROM hist, k WHERE cum >= k.k),
         t AS (
           SELECT e.event_type,
             CAST(abs(e.cents - p.pred) <= q.qhat AS BIGINT) AS cov
           FROM ev e JOIN pred p ON e.event_type = p.event_type
           CROSS JOIN qhat q WHERE e.half = 1),
         per AS (
           SELECT event_type, count(*) AS n_test, sum(cov) AS n_covered
           FROM t GROUP BY 1
           UNION ALL
           SELECT '__all__', count(*), sum(cov) FROM t)
         SELECT event_type, CAST(n_test AS BIGINT) AS n_test,
           CAST(n_covered AS BIGINT) AS n_covered,
           CAST(n_covered * 1000000 // n_test AS BIGINT) AS coverage_ppm
         FROM per""")
}
