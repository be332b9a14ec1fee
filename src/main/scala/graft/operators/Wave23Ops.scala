package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 23: statistical plumbing for curation decisions —
  * normalizing a raw score into a corpus-relative one, quantifying how
  * much two heuristic filters actually agree, and putting error bars
  * on a corpus metric without rerunning the pipeline.
  *
  *   - q232 percentile-rank normalization: every event's value mapped
  *     to its exact corpus percentile (ppm) — the rank transform that
  *     makes thresholds transferable across corpora.
  *   - q233 filter-agreement audit: Cohen's kappa between two quality
  *     gates (length vs token-count), chance-corrected, in integer ppm.
  *   - q234 deterministic Poisson bootstrap: 20 hash-seeded resample
  *     replicates of the mean-value metric in one pass — the
  *     error-bar machinery of the online/big-data bootstrap, fully
  *     reproducible under any partitioning.
  */
object Wave23Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q232: percentile-rank normalization ---------------------------
    // pct(x) = (#rows strictly below x)·1e6 div n. The corpus reduces
    // to the per-distinct-value histogram (one map-side-combined
    // shuffle, domain-bounded); the strictly-below cumulative runs on
    // the domain-sized frame; rows get their percentile back through a
    // join keyed on the value (domain-sized build side — broadcastable
    // here, plain hash join at wider domains). Same domain-histogram
    // backbone as q228/q229 — this is the row-level companion that
    // WRITES the normalized score back onto the corpus.
    "q232_percentile_rank" -> ((s, d) => {
      val ev = table(s, d, "events").select(col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val hist = ev.groupBy("cents").agg(count(lit(1)).as("n_c"))
      val below = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist.withColumn("cum_below",
        coalesce(sum("n_c").over(below), lit(0L)))
      val tot = ev.agg(count(lit(1)).as("n"))
      ev.join(broadcast(cum.select("cents", "cum_below")), "cents")
        .crossJoin(broadcast(tot))
        .select(col("event_id"), col("cents"),
          expr("cum_below * 1000000L div n").as("pct_ppm"))
    }),

    // ---- q233: filter-agreement audit (Cohen's kappa) ------------------
    // Two real quality gates over documents — A: length ≥ 300 chars,
    // B: whitespace tokens ≥ 55 — and their chance-corrected agreement:
    // kappa = (p_o − p_e) / (1 − p_e) on the ppm scale, all integer
    // (p_e's product term divides by n² before scaling). High kappa ⇒
    // the second filter adds little signal; near-zero ⇒ the gates cut
    // different corpora. ONE conditional-aggregation scan, 1-row output.
    "q233_filter_kappa" -> ((s, d) => {
      val flags = table(s, d, "documents").select(
        expr("CASE WHEN length(text) >= 300 THEN 1L ELSE 0L END").as("a"),
        expr("CASE WHEN length(text) - length(replace(text, ' ', '')) + 1" +
          " >= 55 THEN 1L ELSE 0L END").as("b"))
      flags.agg(
        count(lit(1)).as("n"),
        sum(expr("a * b")).as("n11"),
        sum(expr("a * (1 - b)")).as("n10"),
        sum(expr("(1 - a) * b")).as("n01"),
        sum(expr("(1 - a) * (1 - b)")).as("n00"))
        .withColumn("po_ppm", expr("(n11 + n00) * 1000000L div n"))
        .withColumn("pe_ppm", expr(
          "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))" +
            " * 1000000L div (n * n)"))
        .withColumn("kappa_ppm", expr(
          "(po_ppm - pe_ppm) * 1000000L div (1000000L - pe_ppm)"))
    }),

    // ---- q234: deterministic Poisson bootstrap -------------------------
    // The big-data bootstrap: replicate b weights each row by an
    // independent Poisson(1) draw; the spread of the replicate means IS
    // the sampling uncertainty of the corpus mean. Draws are
    // hash-seeded (md5 of row-id × replicate), so the whole resample is
    // a PURE MAP: reproducible under any partitioning, no RNG state,
    // no second corpus pass. Inverse-CDF thresholds are fixed ppm
    // constants (P(0)=P(1)=.367879, ...), weights capped at 5. The ×20
    // explode is a bounded fan-out (documented class); replicate means
    // aggregate map-side into 20 rows, then a 1-row summary: the
    // unweighted mean, the bootstrap mean-of-means, and the integer
    // variance of the replicate means (the error bar, ppm-free since
    // cents are already integer).
    "q234_poisson_bootstrap" -> ((s, d) => {
      val ev = table(s, d, "events").select(col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val reps = ev
        .select(col("event_id"), col("cents"),
          explode(expr("sequence(0L, 19L)")).as("rep"))
        .withColumn("u", expr(
          "CAST(conv(substring(md5(CAST(event_id * 20 + rep AS STRING))," +
            " 1, 13), 16, 10) AS BIGINT) % 1000000"))
        .withColumn("w", expr(
          "CASE WHEN u < 367879 THEN 0L WHEN u < 735759 THEN 1L" +
            " WHEN u < 919699 THEN 2L WHEN u < 981012 THEN 3L" +
            " WHEN u < 996340 THEN 4L ELSE 5L END"))
        .groupBy("rep")
        .agg(sum(expr("w * cents")).as("wsum"), sum("w").as("wn"))
        .select(col("rep"), expr("wsum div wn").as("mean_b"))
      val base = ev.agg(count(lit(1)).as("n"),
        expr("sum(cents) div count(1)").as("mean_cents"))
      val center = reps.agg(
        expr("sum(mean_b) div count(1)").as("boot_mean"))
      reps.crossJoin(broadcast(center))
        .agg(count(lit(1)).as("n_reps"),
          min("boot_mean").as("boot_mean"),
          expr("sum((mean_b - boot_mean) * (mean_b - boot_mean))" +
            " div count(1)").as("boot_var"),
          min("mean_b").as("rep_min"), max("mean_b").as("rep_max"))
        .crossJoin(broadcast(base))
    }))

  val oracle: Map[String, String] = Map(
    "q232_percentile_rank" ->
      """WITH ev AS (
           SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         hist AS (SELECT cents, count(*) AS n_c FROM ev GROUP BY 1),
         cum AS (
           SELECT cents,
                  coalesce(sum(n_c) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cum_below
           FROM hist),
         tot AS (SELECT count(*) AS n FROM ev)
         SELECT event_id, cents,
                CAST(cum_below * 1000000 // n AS BIGINT) AS pct_ppm
         FROM ev JOIN cum USING (cents), tot""",
    "q233_filter_kappa" ->
      """WITH flags AS (
           SELECT CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END AS a,
                  CASE WHEN length(text) - length(replace(text, ' ', ''))
                       + 1 >= 55 THEN 1 ELSE 0 END AS b
           FROM documents),
         c AS (
           SELECT count(*) AS n, sum(a * b) AS n11,
                  sum(a * (1 - b)) AS n10, sum((1 - a) * b) AS n01,
                  sum((1 - a) * (1 - b)) AS n00
           FROM flags),
         p AS (
           SELECT *, (n11 + n00) * 1000000 // n AS po_ppm,
                  ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)) * 1000000 // (n * n)
                    AS pe_ppm
           FROM c)
         SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
                CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
                CAST(n00 AS BIGINT) AS n00,
                CAST(po_ppm AS BIGINT) AS po_ppm,
                CAST(pe_ppm AS BIGINT) AS pe_ppm,
                CAST((po_ppm - pe_ppm) * 1000000
                     // (1000000 - pe_ppm) AS BIGINT) AS kappa_ppm
         FROM p""",
    "q234_poisson_bootstrap" ->
      """WITH ev AS (
           SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         reps AS (
           SELECT e.event_id, e.cents, r.rep,
                  CAST(('0x' || substr(md5(CAST(e.event_id * 20 + r.rep
                    AS VARCHAR)), 1, 13)) AS BIGINT) % 1000000 AS u
           FROM ev e, (SELECT unnest(range(20)) AS rep) r),
         w AS (
           SELECT rep, cents,
                  CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                       WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
                       WHEN u < 996340 THEN 4 ELSE 5 END AS w
           FROM reps),
         m AS (
           SELECT rep, sum(w * cents) // sum(w) AS mean_b
           FROM w GROUP BY 1),
         center AS (SELECT sum(mean_b) // count(*) AS boot_mean FROM m),
         base AS (
           SELECT count(*) AS n, sum(cents) // count(*) AS mean_cents
           FROM ev)
         SELECT CAST(count(*) AS BIGINT) AS n_reps,
                CAST(min(boot_mean) AS BIGINT) AS boot_mean,
                CAST(sum((mean_b - boot_mean) * (mean_b - boot_mean))
                     // count(*) AS BIGINT) AS boot_var,
                CAST(min(mean_b) AS BIGINT) AS rep_min,
                CAST(max(mean_b) AS BIGINT) AS rep_max,
                CAST(min(n) AS BIGINT) AS n,
                CAST(min(mean_cents) AS BIGINT) AS mean_cents
         FROM m, center, base""")
}
