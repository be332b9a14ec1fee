package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 42: statistical data-quality audits + layout advice.
  *
  *   - q268 Simpson's-paradox detector: per-slice vs pooled trend
  *     direction, integer-exact covariance numerators.
  *   - q269 Benford first-digit audit: observed vs log-law first-digit
  *     shares — the fraud/synthetic-data screen.
  *   - q270 RLE/sortedness advisor: run counts per column in storage
  *     order — whether run-length encoding (or a re-sort) pays.
  */
object Wave42Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Benford expected first-digit shares, ppm of log10(1+1/d) —
    * hardcoded integers shared verbatim with the oracle so no engine
    * ever evaluates a float log. */
  private val BenfordPpm = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  val queries: Map[String, Q] = Map(
    // ---- q268: Simpson's-paradox trend audit ---------------------------
    // Slope sign of cents vs hour-of-day, per event_type and pooled:
    // num = n·Σxy − Σx·Σy (the regression-slope numerator — exact
    // integers, no division). A slice whose sign differs from the
    // pooled sign is the paradox flag: aggregate the corpus once per
    // grouping (two map-side-combined rollups), broadcast the pooled
    // 1-row frame.
    "q268_simpson_audit" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_type"),
          expr("(ts div 3600000000000) % 24").as("x"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("y"))
      def mom(df: DataFrame, keys: Seq[String]) = {
        val g = if (keys.isEmpty) df.groupBy() else df.groupBy(keys.head)
        g.agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum("y").as("sy"), sum(expr("x * y")).as("sxy"))
          .withColumn("num", expr("n * sxy - sx * sy"))
      }
      val pooled = mom(ev, Nil)
        .select(col("num").as("pooled_num"))
      mom(ev, Seq("event_type"))
        .crossJoin(broadcast(pooled))
        .select(col("event_type"), col("n"), col("num").as("slice_num"),
          col("pooled_num"),
          // sign comparison, NOT a product — slice·pooled overflows
          // long once each numerator passes ~3e9 (n·Σxy grows with n²)
          when((col("num") < 0) =!= (col("pooled_num") < 0) &&
            col("num") =!= 0 && col("pooled_num") =!= 0, 1L)
            .otherwise(0L).as("sign_flip"))
    }),

    // ---- q269: Benford first-digit audit -------------------------------
    // First digit via string head of the positive integer cents — no
    // float log anywhere; expected shares are the shared hardcoded
    // ppm table (broadcast 9-row join). chi_ppm is each digit's
    // (obs−exp)²/exp contribution — the screening statistic for
    // "does this value column look organic".
    "q269_benford_audit" -> ((s, d) => {
      val digits = table(s, d, "events")
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .filter(col("cents") > 0)
        .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
          .as("digit"))
      val expect = s
        .createDataFrame(BenfordPpm.map { case (d0, p) => (d0.toLong, p) })
        .toDF("digit", "exp_ppm")
      val n = digits.agg(count(lit(1)).as("n_total"))
      digits.groupBy("digit").agg(count(lit(1)).as("n_obs"))
        .crossJoin(broadcast(n))
        .join(broadcast(expect), "digit")
        .select(col("digit"), col("n_obs"),
          expr("n_obs * 1000000 div n_total").as("obs_ppm"),
          col("exp_ppm"),
          expr("""(n_obs * 1000000 div n_total - exp_ppm)
                  * (n_obs * 1000000 div n_total - exp_ppm)
                  div exp_ppm""").as("chi_ppm"))
    }),

    // ---- q270: RLE/sortedness advisor ----------------------------------
    // Runs per column in STORAGE order (event_id is the dense write
    // order, asserted min/max/count elsewhere): adjacency via the
    // id−1 EQUI-join — a co-partitioned hash join at any scale, never
    // a global-order window. One joined scan emits all columns' run
    // counts; rle_ppm = runs/rows — near 1e6 means RLE is pointless
    // without a re-sort (cf. q127 Z-order / q163 zone maps).
    "q270_rle_advisor" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_id"), col("event_type"), col("user_id"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
          expr("ts div 86400000000000").as("day"))
      val prev = ev.select(col("event_id").as("pid"),
        col("event_type").as("p_type"), col("user_id").as("p_user"),
        col("cents").as("p_cents"), col("day").as("p_day"))
      val joined = ev.join(prev, col("event_id") === col("pid") + 1)
      val tot = ev.agg(count(lit(1)).as("n_rows"))
      joined.agg(
          sum(when(col("event_type") =!= col("p_type"), 1L).otherwise(0L))
            .as("ch_type"),
          sum(when(col("user_id") =!= col("p_user"), 1L).otherwise(0L))
            .as("ch_user"),
          sum(when(col("cents") =!= col("p_cents"), 1L).otherwise(0L))
            .as("ch_cents"),
          sum(when(col("day") =!= col("p_day"), 1L).otherwise(0L))
            .as("ch_day"))
        .crossJoin(broadcast(tot))
        .select(explode(array(
          struct(lit("event_type").as("col_name"),
            (col("ch_type") + 1).as("n_runs")),
          struct(lit("user_id").as("col_name"),
            (col("ch_user") + 1).as("n_runs")),
          struct(lit("cents").as("col_name"),
            (col("ch_cents") + 1).as("n_runs")),
          struct(lit("day").as("col_name"),
            (col("ch_day") + 1).as("n_runs")))).as("p"), col("n_rows"))
        .select(col("p.col_name").as("col_name"),
          col("p.n_runs").as("n_runs"), col("n_rows"),
          expr("p.n_runs * 1000000 div n_rows").as("rle_ppm"))
    }))

  private val benfordSql = BenfordPpm
    .map { case (d0, p) => s"SELECT $d0 AS digit, ${p} AS exp_ppm" }
    .mkString(" UNION ALL ")

  val oracle: Map[String, String] = Map(
    "q268_simpson_audit" ->
      """WITH ev AS (
           SELECT event_type, (epoch_ns(ts) // 3600000000000) % 24 AS x,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events),
         sl AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy
           FROM ev GROUP BY 1),
         pl AS (
           SELECT CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
             AS pooled_num
           FROM ev)
         SELECT event_type, n, n * sxy - sx * sy AS slice_num, pooled_num,
           CAST(CASE WHEN ((n * sxy - sx * sy) < 0) <> (pooled_num < 0)
               AND (n * sxy - sx * sy) <> 0 AND pooled_num <> 0
             THEN 1 ELSE 0 END AS BIGINT) AS sign_flip
         FROM sl CROSS JOIN pl""",

    "q269_benford_audit" ->
      s"""WITH digits AS (
           SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
             AS digit
           FROM (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                 FROM events)
           WHERE cents > 0),
         n AS (SELECT count(*) AS n_total FROM digits),
         e AS ($benfordSql),
         o AS (SELECT digit, count(*) AS n_obs FROM digits GROUP BY 1)
         SELECT o.digit, o.n_obs,
           o.n_obs * 1000000 // n.n_total AS obs_ppm,
           CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           (o.n_obs * 1000000 // n.n_total - e.exp_ppm)
             * (o.n_obs * 1000000 // n.n_total - e.exp_ppm)
             // e.exp_ppm AS chi_ppm
         FROM o CROSS JOIN n JOIN e ON e.digit = o.digit""",

    "q270_rle_advisor" ->
      """WITH ev AS (
           SELECT event_id, event_type, user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_ns(ts) // 86400000000000 AS day
           FROM events),
         j AS (
           SELECT c.event_type AS t, p.event_type AS pt,
             c.user_id AS u, p.user_id AS pu,
             c.cents AS v, p.cents AS pv,
             c.day AS dd, p.day AS pd
           FROM ev c JOIN ev p ON c.event_id = p.event_id + 1),
         ch AS (
           SELECT
             CAST(sum(CASE WHEN t <> pt THEN 1 ELSE 0 END) + 1 AS BIGINT)
               AS r_type,
             CAST(sum(CASE WHEN u <> pu THEN 1 ELSE 0 END) + 1 AS BIGINT)
               AS r_user,
             CAST(sum(CASE WHEN v <> pv THEN 1 ELSE 0 END) + 1 AS BIGINT)
               AS r_cents,
             CAST(sum(CASE WHEN dd <> pd THEN 1 ELSE 0 END) + 1 AS BIGINT)
               AS r_day
           FROM j),
         n AS (SELECT count(*) AS n_rows FROM ev)
         SELECT col_name, n_runs, n_rows,
           n_runs * 1000000 // n_rows AS rle_ppm
         FROM (
           SELECT 'event_type' AS col_name, r_type AS n_runs FROM ch
           UNION ALL SELECT 'user_id', r_user FROM ch
           UNION ALL SELECT 'cents', r_cents FROM ch
           UNION ALL SELECT 'day', r_day FROM ch)
         CROSS JOIN n""")
}
