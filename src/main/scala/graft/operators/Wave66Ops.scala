package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 66: feed-health monitors — a category/schema drift
  * audit over a temporal split of the event feed, and an
  * embedding-space outlier scan (distance to own-label centroid, the
  * inverse of q147's SemDeDup nearness). Both are one-pass shapes:
  * the drift audit reduces to a |event_type|-row frame, the outlier
  * scan to a P-row centroid broadcast plus a map-only score and a
  * TakeOrdered top-k — no corpus-sized window anywhere.
  */
object Wave66Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Sequential double dot product (VectorOps / list_dot_product
    * contract). */
  private def dotD(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> x * y),
        CAST(0 AS DOUBLE), (acc, t) -> acc + t)""")

  val queries: Map[String, Q] = Map(
    // ---- q319: category + null-rate drift across a temporal split -----
    // The feed splits at its time midpoint (q309's bounds pattern);
    // each event_type reports counts, corpus-share ppm, share delta,
    // and the props null-rate ppm on each side, plus a new/gone/common
    // status (absence on one side IS the schema drift). One corpus
    // pass folds to the |event_type| frame; the share totals come from
    // an unpartitioned window over that tiny frame, not the corpus.
    "q319_category_drift_audit" -> ((s, d) => {
      val ev = table(s, d, "events")
      val bounds = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
      ev.crossJoin(broadcast(bounds))
        .withColumn("late",
          expr("CAST(ts >= t0 + (t1 - t0) div 2 AS BIGINT)"))
        .groupBy("event_type")
        .agg(
          sum(expr("1 - late")).as("cnt_a"),
          sum("late").as("cnt_b"),
          sum(expr("(1 - late) * CAST(props IS NULL AS BIGINT)"))
            .as("null_a"),
          sum(expr("late * CAST(props IS NULL AS BIGINT)")).as("null_b"))
        .withColumn("share_a_ppm",
          expr("cnt_a * 1000000 div sum(cnt_a) OVER ()"))
        .withColumn("share_b_ppm",
          expr("cnt_b * 1000000 div sum(cnt_b) OVER ()"))
        .select(col("event_type"), col("cnt_a"), col("cnt_b"),
          col("share_a_ppm"), col("share_b_ppm"),
          (col("share_b_ppm") - col("share_a_ppm")).as("delta_ppm"),
          expr("CASE WHEN cnt_a = 0 THEN 0 " +
            "ELSE null_a * 1000000 div cnt_a END").as("null_a_ppm"),
          expr("CASE WHEN cnt_b = 0 THEN 0 " +
            "ELSE null_b * 1000000 div cnt_b END").as("null_b_ppm"),
          expr("CASE WHEN cnt_a = 0 THEN 'new' " +
            "WHEN cnt_b = 0 THEN 'gone' ELSE 'common' END").as("status"))
    }),

    // ---- q320: embedding outliers by own-centroid distance -------------
    // Per-label centroids (P×dim broadcast frame, q282's build); each
    // vector's exact squared distance to ITS OWN label centroid
    // v·v − 2 v·c + c·c (sequential-double, round-6 pinned); global
    // top-20 by (distance desc, vec_id) via TakeOrdered — the
    // scalable top-k, no corpus-sized window. These are the points a
    // curation pass would eyeball as mislabeled or junk.
    "q320_embedding_outlier_scan" -> ((s, d) => {
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
      e.join(broadcast(cents), col("label") === col("clabel"))
        .withColumn("dist2", round(
          dotD("v", "v") - lit(2) * dotD("v", "cvec")
            + dotD("cvec", "cvec"), 6))
        .orderBy(col("dist2").desc, col("vec_id"))
        .limit(20)
        .select(col("vec_id"), col("label"), col("dist2"))
    }))

  val oracle: Map[String, String] = Map(
    "q319_category_drift_audit" ->
      """WITH b AS (
           SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
           FROM events),
         f AS (
           SELECT event_type, props,
             CASE WHEN epoch_ns(ts) >= t0 + (t1 - t0) // 2
               THEN 1 ELSE 0 END AS late
           FROM events, b),
         g AS (
           SELECT event_type,
             sum(1 - late) AS cnt_a, sum(late) AS cnt_b,
             sum((1 - late) * CASE WHEN props IS NULL THEN 1 ELSE 0 END)
               AS null_a,
             sum(late * CASE WHEN props IS NULL THEN 1 ELSE 0 END)
               AS null_b
           FROM f GROUP BY 1),
         sh AS (
           SELECT *,
             cnt_a * 1000000 // sum(cnt_a) OVER () AS share_a_ppm,
             cnt_b * 1000000 // sum(cnt_b) OVER () AS share_b_ppm
           FROM g)
         SELECT event_type, CAST(cnt_a AS BIGINT) AS cnt_a,
           CAST(cnt_b AS BIGINT) AS cnt_b,
           CAST(share_a_ppm AS BIGINT) AS share_a_ppm,
           CAST(share_b_ppm AS BIGINT) AS share_b_ppm,
           CAST(share_b_ppm - share_a_ppm AS BIGINT) AS delta_ppm,
           CAST(CASE WHEN cnt_a = 0 THEN 0
             ELSE null_a * 1000000 // cnt_a END AS BIGINT) AS null_a_ppm,
           CAST(CASE WHEN cnt_b = 0 THEN 0
             ELSE null_b * 1000000 // cnt_b END AS BIGINT) AS null_b_ppm,
           CASE WHEN cnt_a = 0 THEN 'new'
                WHEN cnt_b = 0 THEN 'gone' ELSE 'common' END AS status
         FROM sh""",

    "q320_embedding_outlier_scan" ->
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
           GROUP BY clabel)
         SELECT e.vec_id, e.label,
           round(list_dot_product(e.v, e.v)
             - 2 * list_dot_product(e.v, c.cvec)
             + list_dot_product(c.cvec, c.cvec), 6) AS dist2
         FROM e JOIN cent c ON e.label = c.clabel
         ORDER BY dist2 DESC, e.vec_id
         LIMIT 20""")
}
