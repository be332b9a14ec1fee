package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 97: semi-structured + calendar-grid shapes — JSON
  * payload field profiling (the first thing a pipeline does to a
  * `props` column: extract, type-check, profile — Spark
  * `get_json_object` vs DuckDB `json_extract_string`, both codegen'd
  * scalar paths) and the hour-of-day × day-of-week activity heatmap
  * (the bounded 168-cell ops grid with the peak cell flagged).
  */
object Wave97Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q381: JSON payload field profile ---------------------------------
    // k = $.k extracted per event (map-only scalar JSON path); per
    // event_type: parse-failure count (schema drift detector), exact
    // min/max/mean micro of k, and the share of k ≥ 50 in ppm. One
    // corpus pass folding to the |types| frame.
    "q381_json_field_profile" -> ((s, d) => {
      table(s, d, "events")
        .select(col("event_type").as("et"),
          expr("CAST(get_json_object(props, '$.k') AS BIGINT)")
            .as("k"))
        .groupBy("et")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(k IS NULL AS BIGINT)")).as("n_unparsed"),
          min("k").as("min_k"), max("k").as("max_k"),
          expr("sum(k) * 1000000 div count(k)").as("mean_k_micro"),
          expr("""sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) * 1000000
              div count(k)""").as("high_k_ppm"))
    }),

    // ---- q382: hour-of-day × day-of-week heatmap ---------------------------
    // The canonical 168-cell activity grid: per (dow, hod) counts and
    // corpus share; the global peak cell flagged via the struct-max
    // recipe. Epoch-derived dow (day 0 = Thursday, pinned identically
    // in both engines by pure integer arithmetic — no locale, no tz).
    "q382_activity_heatmap" -> ((s, d) => {
      val g = table(s, d, "events")
        .select(
          expr("((ts div 86400000000000) + 4) % 7").as("dow"),
          expr("(ts div 3600000000000) % 24").as("hod"))
        .groupBy("dow", "hod").agg(count(lit(1)).as("n"))
      g.withColumn("share_ppm",
          expr("n * 1000000 div sum(n) OVER ()"))
        .withColumn("best", expr(
          "max(struct(n, dow, hod)) OVER ()"))
        .select(col("dow"), col("hod"), col("n"), col("share_ppm"),
          (col("n") === col("best.n") && col("dow") === col("best.dow")
            && col("hod") === col("best.hod")).cast("long")
            .as("is_peak"))
    }))

  val oracle: Map[String, String] = Map(
    "q381_json_field_profile" ->
      """WITH e AS (
           SELECT event_type AS et,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT et, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unparsed,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(k) * 1000000 // count(k) AS BIGINT)
             AS mean_k_micro,
           CAST(sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) * 1000000
             // count(k) AS BIGINT) AS high_k_ppm
         FROM e GROUP BY 1""",

    "q382_activity_heatmap" ->
      """WITH g AS (
           SELECT ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
             (epoch_ns(ts) // 3600000000000) % 24 AS hod,
             count(*) AS n
           FROM events GROUP BY 1, 2),
         best AS (
           SELECT n AS bn, dow AS bd, hod AS bh FROM g
           ORDER BY n DESC, dow DESC, hod DESC LIMIT 1)
         SELECT dow, hod, CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS share_ppm,
           CAST(CASE WHEN n = bn AND dow = bd AND hod = bh
             THEN 1 ELSE 0 END AS BIGINT) AS is_peak
         FROM g, best""")
}
