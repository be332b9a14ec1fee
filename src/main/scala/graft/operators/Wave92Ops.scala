package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 92: model-feature diagnostics — per-dimension Fisher
  * separability of the embedding space (which coordinates actually
  * separate the labels) and the Qini-style uplift-by-decile curve
  * (does the treatment effect concentrate in a scoreable segment).
  * Embedding floats are QUANTIZED to exact micro integers at the
  * boundary so every moment is an order-independent integer sum —
  * the discipline that makes float analytics cross-engine exact.
  */
object Wave92Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q371: Fisher separability per embedding dimension --------------
    // x_q = ⌊x·1e6⌋ per (vector, dim); per (dim, label): n, Σx, Σx²
    // (DECIMAL); Fisher ratio = between-class SS over within-class SS
    // in ppm, all from the label-moment frame (64 dims × 10 labels).
    // The top dims are where a cheap slice-based router would look.
    "q371_fisher_separability" -> ((s, d) => {
      val q = table(s, d, "embeddings")
        .select(col("label").cast("long").as("lbl"),
          posexplode(expr(
            "transform(embedding, x -> CAST(floor(x * 1000000) AS BIGINT))"))
            .as(Seq("dim", "xq")))
      val lm = q.groupBy("dim", "lbl")
        .agg(count(lit(1)).as("n"), sum("xq").as("sx"),
          sum(expr("CAST(xq AS DECIMAL(38,0)) * xq")).as("sxx"))
      // between-class SS avoids per-label division by lifting to the
      // common denominator: Σ_l (sx_l·nn − n_l·sxt)² div (n_l·nn²)
      val joined = lm.join(
        lm.groupBy("dim").agg(sum("n").as("nn"), sum("sx").as("sxt")),
        "dim")
      joined
        .withColumn("between_term", expr(
          """(CAST(sx AS DECIMAL(38,0)) * nn
             - CAST(n AS DECIMAL(38,0)) * sxt)
             * (CAST(sx AS DECIMAL(38,0)) * nn
             - CAST(n AS DECIMAL(38,0)) * sxt)
             div (CAST(n AS DECIMAL(38,0)) * nn * nn)"""))
        .withColumn("within_term", expr(
          """CAST(sxx AS DECIMAL(38,0))
             - CAST(sx AS DECIMAL(38,0)) * sx div n"""))
        .groupBy("dim")
        .agg(max("nn").as("n_vectors"),
          expr("""CAST(sum(between_term) * 1000000
              div greatest(CAST(1 AS DECIMAL(38,0)), sum(within_term))
              AS BIGINT)""").as("fisher_ppm"))
        .select(col("dim").cast("long").as("dim"), col("n_vectors"),
          col("fisher_ppm"))
    }),

    // ---- q372: uplift (Qini) by pre-spend decile -------------------------
    // Users scored by pre-period spend (the proxy targeting score);
    // deciles by the exact inclusive-CDF cuts; per decile the
    // treated-vs-control post-spend means and their difference
    // (uplift micro) plus the cumulative uplift running top-down —
    // the Qini curve points that tell you WHO to treat. One user
    // fold; decile frame arithmetic only.
    "q372_uplift_deciles" -> ((s, d) => {
      val ev = table(s, d, "events")
      val bounds = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
      val users = ev.crossJoin(broadcast(bounds))
        .withColumn("late",
          expr("CAST(ts >= t0 + (t1 - t0) div 2 AS BIGINT)"))
        .groupBy("user_id")
        .agg(sum(expr("(1 - late) * CAST(floor(value * 100) AS BIGINT)"))
          .as("x"),
          sum(expr("late * CAST(floor(value * 100) AS BIGINT)"))
            .as("y"))
        .withColumn("t", expr("user_id % 2"))
      val h = users.groupBy("x").agg(count(lit(1)).as("c"))
      val cuts = h.withColumn("cum", sum("c").over(
          Window.orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(h.agg(sum("c").as("n"))))
        .crossJoin(broadcast(s.range(1, 10).select(col("id").as("j"))))
        .filter(col("cum") * 10 >= col("n") * col("j"))
        .groupBy("j").agg(min("x").as("thr"))
        .agg(expr("sort_array(collect_list(struct(j, thr)))").as("ts"))
        .select(expr("transform(ts, t -> t.thr)").as("thrs"))
      val dec = users.crossJoin(broadcast(cuts))
        .withColumn("decile", expr(
          """1 + size(filter(thrs, t -> x >= t))"""))
        .groupBy("decile")
        .agg(
          sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_t"),
          sum(when(col("t") === 1, col("y")).otherwise(0L)).as("sy_t"),
          sum(when(col("t") === 0, 1L).otherwise(0L)).as("n_c"),
          sum(when(col("t") === 0, col("y")).otherwise(0L)).as("sy_c"))
        .filter(col("n_t") > 0 && col("n_c") > 0)
        .withColumn("uplift_micro", expr(
          "sy_t * 1000000 div n_t - sy_c * 1000000 div n_c"))
      dec.withColumn("cum_uplift_micro",
          sum("uplift_micro").over(Window.orderBy(col("decile").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("decile").cast("long").as("decile"), col("n_t"),
          col("n_c"), col("uplift_micro"), col("cum_uplift_micro"))
    }))

  val oracle: Map[String, String] = Map(
    "q371_fisher_separability" ->
      """WITH q AS (
           SELECT CAST(label AS BIGINT) AS lbl, i - 1 AS dim,
             CAST(floor(x * 1000000) AS BIGINT) AS xq
           FROM (SELECT label,
                   unnest(range(1, len(embedding) + 1)) AS i,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
                 FROM embeddings)),
         lm AS (
           SELECT dim, lbl, count(*) AS n, sum(xq) AS sx,
             sum(CAST(xq AS HUGEINT) * xq) AS sxx
           FROM q GROUP BY 1, 2),
         dm AS (
           SELECT dim, sum(n) AS nn, sum(sx) AS sxt
           FROM lm GROUP BY 1),
         terms AS (
           SELECT lm.dim,
             (CAST(lm.sx AS HUGEINT) * nn - CAST(lm.n AS HUGEINT) * sxt)
             * (CAST(lm.sx AS HUGEINT) * nn
                - CAST(lm.n AS HUGEINT) * sxt)
             // (CAST(lm.n AS HUGEINT) * nn * nn) AS between_term,
             CAST(lm.sxx AS HUGEINT)
               - CAST(lm.sx AS HUGEINT) * lm.sx // lm.n AS within_term,
             nn
           FROM lm JOIN dm ON lm.dim = dm.dim)
         SELECT CAST(dim AS BIGINT) AS dim,
           CAST(max(nn) AS BIGINT) AS n_vectors,
           CAST(sum(between_term) * 1000000
             // greatest(CAST(1 AS HUGEINT), sum(within_term))
             AS BIGINT) AS fisher_ppm
         FROM terms GROUP BY dim""",

    "q372_uplift_deciles" ->
      """WITH b AS (
           SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
           FROM events),
         u AS (
           SELECT user_id,
             sum(CASE WHEN epoch_ns(ts) < t0 + (t1 - t0) // 2
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS x,
             sum(CASE WHEN epoch_ns(ts) >= t0 + (t1 - t0) // 2
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS y,
             user_id % 2 AS t
           FROM events, b GROUP BY user_id),
         h AS (SELECT x, count(*) AS c FROM u GROUP BY 1),
         n AS (SELECT sum(c) AS n FROM h),
         cuts AS (
           SELECT jj.j, min(cum.x) AS thr
           FROM (SELECT x, sum(c) OVER (ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS cum FROM h) cum,
             n, (SELECT unnest(range(1, 10)) AS j) jj
           WHERE cum.cum * 10 >= n.n * jj.j
           GROUP BY 1),
         dec AS (
           SELECT u.*,
             1 + (SELECT count(*) FROM cuts WHERE u.x >= cuts.thr)
               AS decile
           FROM u),
         g AS (
           SELECT decile,
             sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n_t,
             sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS sy_t,
             sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n_c,
             sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS sy_c
           FROM dec GROUP BY 1),
         up AS (
           SELECT decile, n_t, n_c,
             sy_t * 1000000 // n_t - sy_c * 1000000 // n_c
               AS uplift_micro
           FROM g WHERE n_t > 0 AND n_c > 0)
         SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
           CAST(uplift_micro AS BIGINT) AS uplift_micro,
           CAST(sum(uplift_micro) OVER (ORDER BY decile DESC
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_uplift_micro
         FROM up""")
}
