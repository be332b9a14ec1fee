package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 53: automated feature auditing over the event stream —
  * the two screens a feature store runs before a model ever trains.
  *
  *   - q293 feature relevance ranking: mutual information (micro-nats)
  *     and the chi-square statistic of each candidate feature against
  *     the purchase label, from ONE stacked contingency pass.
  *   - q294 target-leakage scan: per-feature ROC AUC (q228's exact
  *     U-statistic, partitioned by feature); a feature whose solo AUC
  *     approaches 1.0 (or 0.0) is leaking the label and gets flagged.
  *
  * Both stack the candidate features by exploding each row onto
  * (feature, value) pairs — map-side, one pass over the corpus, then
  * domain-bounded per-feature histograms (the value domain caps the
  * frame, never the row count), so the audit costs O(corpus) at any
  * scale with 5× map amplification and tiny shuffles.
  */
object Wave53Ops {

  type Q = (SparkSession, String) => DataFrame

  /** (feature, score fval, MI bin, pos) stack: spend cents (binned to
    * 20 for MI), hour-of-day, day-of-week, user_id mod 100 (a control
    * that must score near-random), and the props JSON counter. */
  private def stacked(s: SparkSession, d: String): DataFrame = {
    val base = table(s, d, "events").select(
      expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
      expr("(ts div 3600000000000) % 24").as("hour"),
      expr("(ts div 86400000000000 + 4) % 7").as("dow"),
      expr("user_id % 100").as("umod"),
      expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("pk"),
      expr("CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END " +
        "AS BIGINT)").as("pos"))
    val mx = base.agg(max("cents").as("m"))
    base.crossJoin(broadcast(mx))
      .select(col("pos"), explode(array(
        struct(lit("value_cents").as("feature"), col("cents").as("fval"),
          expr("cents div (m div 20 + 1)").as("mbin")),
        struct(lit("hour_of_day").as("feature"), col("hour").as("fval"),
          col("hour").as("mbin")),
        struct(lit("day_of_week").as("feature"), col("dow").as("fval"),
          col("dow").as("mbin")),
        struct(lit("user_mod100").as("feature"), col("umod").as("fval"),
          expr("umod div 5").as("mbin")),
        struct(lit("props_k").as("feature"), col("pk").as("fval"),
          expr("pk div 10").as("mbin")))).as("f"))
      .select(col("f.feature").as("feature"), col("f.fval").as("fval"),
        col("f.mbin").as("mbin"), col("pos"))
  }

  val queries: Map[String, Q] = Map(
    // ---- q293: MI + chi-square feature relevance ----------------------
    // Contingency cells (feature, bin, label) in one shuffle; margins
    // re-aggregate the tiny cell frame. MI cells accumulate
    // n_vy·⌊ln(n_vy·N/(n_v·n_y))·1e6⌋ exactly (i64) and divide ONCE by
    // N with an explicit floor-mod — a per-cell division would hit the
    // trunc-vs-floor divergence on negative cells. Chi-square cells
    // floor((n_vy−E)²/E·1e6) with E in double from exact ints — the
    // established micro-unit discipline, order-independent under any
    // partial aggregation.
    "q293_feature_relevance" -> ((s, d) => {
      val cells = stacked(s, d).groupBy("feature", "mbin", "pos")
        .agg(count(lit(1)).as("n_vy"))
      val nv = cells.groupBy("feature", "mbin").agg(sum("n_vy").as("n_v"))
      val ny = cells.groupBy("feature", "pos").agg(sum("n_vy").as("n_y"))
      val nt = cells.groupBy("feature").agg(sum("n_vy").as("nn"))
      cells
        .join(nv, Seq("feature", "mbin"))
        .join(ny, Seq("feature", "pos"))
        .join(broadcast(nt), "feature")
        .withColumn("mi_num", expr(
          """n_vy * CAST(floor(ln(CAST(n_vy AS DOUBLE) * nn
               / (CAST(n_v AS DOUBLE) * n_y)) * 1000000) AS BIGINT)"""))
        .withColumn("chi_cell", expr(
          """CAST(floor(
               (n_vy - CAST(n_v AS DOUBLE) * n_y / nn)
               * (n_vy - CAST(n_v AS DOUBLE) * n_y / nn)
               / (CAST(n_v AS DOUBLE) * n_y / nn) * 1000000) AS BIGINT)"""))
        .groupBy("feature")
        .agg(countDistinct("mbin").as("n_bins"),
          sum("mi_num").as("mi_num"), max("nn").as("nn"),
          sum("chi_cell").as("chi2_micro"))
        .select(col("feature"), col("n_bins"),
          expr("(mi_num - ((mi_num % nn) + nn) % nn) div nn")
            .as("mi_micro"),
          col("chi2_micro"))
    }),

    // ---- q294: per-feature AUC leakage scan ---------------------------
    // q228's histogram U-statistic, partitioned by feature: per
    // (feature, value) pos/neg counts, cumulative negatives below in
    // value order, AUC = Σ pos·(2·cnb+neg) / 2PN in exact ppm. The
    // window runs over value-domain-sized partitions, never rows.
    // |AUC − ½| > 0.4 flags the feature as label-leaking — spend cents
    // trips it by construction (the label IS a value threshold here),
    // the user-id control must not.
    "q294_target_leakage" -> ((s, d) => {
      val h = stacked(s, d).groupBy("feature", "fval")
        .agg(sum("pos").as("pos_s"), sum(expr("1 - pos")).as("neg_s"))
      val below = Window.partitionBy("feature").orderBy("fval")
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("cnb", coalesce(sum("neg_s").over(below), lit(0L)))
        .groupBy("feature")
        .agg(sum(expr("pos_s * (2 * cnb + neg_s)")).as("u2"),
          sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"))
        .select(col("feature"), col("n_pos"), col("n_neg"),
          expr("u2 * 1000000 div (2 * n_pos * n_neg)").as("auc_ppm"))
        .withColumn("leak_flag",
          expr("abs(auc_ppm - 500000) > 400000"))
    }))

  private val stackedCte =
    """base AS (
         SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
                (epoch_ns(ts) // 3600000000000) % 24 AS hour,
                (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
                user_id % 100 AS umod,
                CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                  AS pk,
                CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                  AS BIGINT) AS pos
         FROM events),
       mx AS (SELECT max(cents) AS m FROM base),
       stacked AS (
         SELECT 'value_cents' AS feature, cents AS fval,
                cents // (m // 20 + 1) AS mbin, pos FROM base, mx
         UNION ALL
         SELECT 'hour_of_day', hour, hour, pos FROM base
         UNION ALL
         SELECT 'day_of_week', dow, dow, pos FROM base
         UNION ALL
         SELECT 'user_mod100', umod, umod // 5, pos FROM base
         UNION ALL
         SELECT 'props_k', pk, pk // 10, pos FROM base)"""

  val oracle: Map[String, String] = Map(
    "q293_feature_relevance" ->
      s"""WITH $stackedCte,
          cells AS (
            SELECT feature, mbin, pos, count(*) AS n_vy
            FROM stacked GROUP BY 1, 2, 3),
          nv AS (SELECT feature, mbin, sum(n_vy) AS n_v
                 FROM cells GROUP BY 1, 2),
          ny AS (SELECT feature, pos, sum(n_vy) AS n_y
                 FROM cells GROUP BY 1, 2),
          nt AS (SELECT feature, sum(n_vy) AS nn FROM cells GROUP BY 1),
          j AS (
            SELECT c.feature, c.mbin, c.n_vy, nv.n_v, ny.n_y, nt.nn,
              c.n_vy * CAST(floor(ln(CAST(c.n_vy AS DOUBLE) * nt.nn
                  / (CAST(nv.n_v AS DOUBLE) * ny.n_y)) * 1000000)
                AS BIGINT) AS mi_num,
              CAST(floor(
                (c.n_vy - CAST(nv.n_v AS DOUBLE) * ny.n_y / nt.nn)
                * (c.n_vy - CAST(nv.n_v AS DOUBLE) * ny.n_y / nt.nn)
                / (CAST(nv.n_v AS DOUBLE) * ny.n_y / nt.nn) * 1000000)
                AS BIGINT) AS chi_cell
            FROM cells c
            JOIN nv ON c.feature = nv.feature AND c.mbin = nv.mbin
            JOIN ny ON c.feature = ny.feature AND c.pos = ny.pos
            JOIN nt ON c.feature = nt.feature)
          SELECT feature,
            CAST(count(DISTINCT mbin) AS BIGINT) AS n_bins,
            CAST((sum(mi_num) - ((sum(mi_num) % max(nn)) + max(nn))
                  % max(nn)) // max(nn) AS BIGINT) AS mi_micro,
            CAST(sum(chi_cell) AS BIGINT) AS chi2_micro
          FROM j GROUP BY feature""",

    "q294_target_leakage" ->
      s"""WITH $stackedCte,
          h AS (
            SELECT feature, fval, sum(pos) AS pos_s,
                   sum(1 - pos) AS neg_s
            FROM stacked GROUP BY 1, 2),
          c AS (
            SELECT feature, pos_s, neg_s,
              coalesce(sum(neg_s) OVER (PARTITION BY feature
                ORDER BY fval ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS cnb
            FROM h),
          a AS (
            SELECT feature, sum(pos_s * (2 * cnb + neg_s)) AS u2,
                   sum(pos_s) AS n_pos, sum(neg_s) AS n_neg
            FROM c GROUP BY 1)
          SELECT feature, CAST(n_pos AS BIGINT) AS n_pos,
            CAST(n_neg AS BIGINT) AS n_neg,
            CAST(u2 * 1000000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm,
            abs(u2 * 1000000 // (2 * n_pos * n_neg) - 500000) > 400000
              AS leak_flag
          FROM a""")
}
