package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 58: sequential analysis and causal adjustment — the
  * two statistical decision shapes the experiment family (q246 raw
  * A/B, q273 bandit replay) still lacked.
  *
  *   - q304 SPRT audit (Wald's sequential probability ratio test):
  *     replay the event stream in arrival order and find the first
  *     moment the log-likelihood ratio for "purchase rate is 0.22"
  *     vs "0.18" crosses the ±ln19 bounds — i.e. when the experiment
  *     COULD have stopped. The running LLR rides the two-phase
  *     distributed prefix sum (TextOps.orderedCumsum), never a
  *     single-partition window.
  *   - q305 stratified treatment effect (the g-formula/standardization
  *     estimator): per-stratum treated-vs-control outcome rates and
  *     the stratum-size-weighted ATE, all exact integer ppm with the
  *     portable floor-division for the signed differences.
  */
object Wave58Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Portable floor division for signed numerators (b > 0). */
  private def floorDiv(a: String, b: String): String =
    s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) div ($b)"

  // LLR increments and the Wald bound, floored micro-nats. Computed
  // IN-ENGINE from pinned literals so both engines run the identical
  // IEEE expression (the q99 ln discipline).
  private val LnHit =
    "CAST(floor(ln(CAST(0.22 AS DOUBLE) / 0.18) * 1000000) AS BIGINT)"
  private val LnMiss =
    "CAST(floor(ln(CAST(0.78 AS DOUBLE) / 0.82) * 1000000) AS BIGINT)"
  private val Bound =
    "CAST(floor(ln(CAST(19 AS DOUBLE)) * 1000000) AS BIGINT)"

  val queries: Map[String, Q] = Map(
    // ---- q304: when could the experiment have stopped? -----------------
    // Each event contributes one of two constant micro-nat increments;
    // the running sum in arrival order (dense event_id) uses the
    // range-partitioned two-phase cumsum, so no corpus-sized sort ever
    // lands on one reducer. First crossing of ±ln19 (α=β=0.05) gives
    // the decision and the sample fraction it needed; 'continue' if
    // the walk never leaves the bounds. Driver state: two scalar rows.
    "q304_sprt_audit" -> ((s, d) => {
      val ev = table(s, d, "events").select(col("event_id"),
        expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
          .as("hit"))
        .withColumn("v",
          expr(s"CASE WHEN hit = 1 THEN $LnHit ELSE $LnMiss END"))
      val cum = TextOps.orderedCumsum(ev, Seq("event_id"), "v",
        "llr_micro")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = cum.agg(count(lit(1)).as("n_total"),
        max("event_id").as("last_id"))
      val cross = cum
        .filter(expr(s"abs(llr_micro) >= $Bound"))
        .agg(min("event_id").as("first_cross_id"))
      val lastLlr = cum.join(broadcast(tot),
        col("event_id") === col("last_id"))
        .select(col("llr_micro").as("final_llr_micro"))
      val crossLlr = cum.join(broadcast(cross),
        col("event_id") === col("first_cross_id"))
        .select(col("llr_micro").as("cross_llr_micro"))
      tot.crossJoin(broadcast(cross))
        .crossJoin(broadcast(lastLlr))
        .join(broadcast(crossLlr), lit(true), "left_outer")
        .select(col("n_total"),
          expr(s"$Bound").as("bound_micro"),
          coalesce(col("first_cross_id"), lit(-1L))
            .as("first_cross_id"),
          expr("""CASE WHEN first_cross_id IS NULL THEN 'continue'
                  WHEN cross_llr_micro > 0 THEN 'accept_h1'
                  ELSE 'accept_h0' END""").as("decision"),
          expr("""coalesce((first_cross_id + 1) * 1000000
                    div n_total, -1)""").as("sample_frac_ppm"),
          col("final_llr_micro"))
    }),

    // ---- q305: stratified (standardized) treatment effect --------------
    // Treatment = user parity (the deterministic assignment q246
    // uses), outcome = purchase, stratum = 6-hour block of day (the
    // "confounder"). Per stratum: arm sizes, outcome rates in floored
    // ppm, signed rate difference via portable floor-div; the __ate__
    // row weights the per-stratum differences by stratum share —
    // Σ n_s·Δ_s / N with ONE signed division at the end. One
    // (stratum, arm) histogram shuffle; everything downstream is on
    // the 4×2-row frame.
    "q305_stratified_ate" -> ((s, d) => {
      val ev = table(s, d, "events").select(
        expr("(ts div 3600000000000) % 24 div 6").as("stratum"),
        expr("user_id % 2").as("t"),
        expr("CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END " +
          "AS BIGINT)").as("y"))
      val g = ev.groupBy("stratum", "t")
        .agg(count(lit(1)).as("n"), sum("y").as("ny"))
      val wide = g.groupBy("stratum").agg(
        sum("n").as("n_s"),
        max(when(col("t") === 1, col("n"))).as("n1"),
        max(when(col("t") === 0, col("n"))).as("n0"),
        max(when(col("t") === 1, col("ny"))).as("ny1"),
        max(when(col("t") === 0, col("ny"))).as("ny0"))
        .withColumn("y1_ppm", expr("ny1 * 1000000 div n1"))
        .withColumn("y0_ppm", expr("ny0 * 1000000 div n0"))
        .withColumn("diff_ppm", col("y1_ppm") - col("y0_ppm"))
      val per = wide.select(
        col("stratum").cast("string").as("stratum"), col("n_s"),
        col("n1").as("n_treated"), col("n0").as("n_control"),
        col("y1_ppm"), col("y0_ppm"), col("diff_ppm"))
      per.unionByName(wide.agg(
        lit("__ate__").as("stratum"), sum("n_s").as("n_s"),
        sum("n1").as("n_treated"), sum("n0").as("n_control"),
        lit(0L).as("y1_ppm"), lit(0L).as("y0_ppm"),
        expr(floorDiv("sum(n_s * diff_ppm)", "sum(n_s)"))
          .as("diff_ppm")))
    }))

  val oracle: Map[String, String] = Map(
    "q304_sprt_audit" ->
      s"""WITH ev AS (
            SELECT event_id,
              CASE WHEN event_type = 'purchase'
                THEN CAST(floor(ln(CAST(0.22 AS DOUBLE) / 0.18)
                       * 1000000) AS BIGINT)
                ELSE CAST(floor(ln(CAST(0.78 AS DOUBLE) / 0.82)
                       * 1000000) AS BIGINT) END AS v
            FROM events),
          cum AS (
            SELECT event_id, sum(v) OVER (ORDER BY event_id
              ROWS UNBOUNDED PRECEDING) AS llr
            FROM ev),
          bound AS (
            SELECT CAST(floor(ln(CAST(19 AS DOUBLE)) * 1000000)
              AS BIGINT) AS b),
          tot AS (SELECT count(*) AS n_total, max(event_id) AS last_id
                  FROM cum),
          cr AS (SELECT min(event_id) AS first_cross_id
                 FROM cum, bound WHERE abs(llr) >= b),
          fin AS (SELECT llr AS final_llr FROM cum, tot
                  WHERE event_id = last_id),
          crl AS (SELECT llr AS cross_llr FROM cum, cr
                  WHERE event_id = first_cross_id)
          SELECT t.n_total, bound.b AS bound_micro,
            coalesce(cr.first_cross_id, -1) AS first_cross_id,
            CASE WHEN cr.first_cross_id IS NULL THEN 'continue'
                 WHEN (SELECT cross_llr FROM crl) > 0 THEN 'accept_h1'
                 ELSE 'accept_h0' END AS decision,
            coalesce((cr.first_cross_id + 1) * 1000000 // t.n_total, -1)
              AS sample_frac_ppm,
            CAST((SELECT final_llr FROM fin) AS BIGINT)
              AS final_llr_micro
          FROM tot t, bound, cr""",

    "q305_stratified_ate" ->
      """WITH ev AS (
           SELECT (epoch_ns(ts) // 3600000000000) % 24 // 6 AS stratum,
                  user_id % 2 AS t,
                  CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                    END AS BIGINT) AS y
           FROM events),
         g AS (SELECT stratum, t, count(*) AS n, sum(y) AS ny
               FROM ev GROUP BY 1, 2),
         wide AS (
           SELECT stratum, sum(n) AS n_s,
             max(CASE WHEN t = 1 THEN n END) AS n1,
             max(CASE WHEN t = 0 THEN n END) AS n0,
             max(CASE WHEN t = 1 THEN ny END) AS ny1,
             max(CASE WHEN t = 0 THEN ny END) AS ny0
           FROM g GROUP BY 1),
         w2 AS (
           SELECT stratum, n_s, n1, n0,
             ny1 * 1000000 // n1 AS y1_ppm,
             ny0 * 1000000 // n0 AS y0_ppm,
             ny1 * 1000000 // n1 - ny0 * 1000000 // n0 AS diff_ppm
           FROM wide)
         SELECT CAST(stratum AS VARCHAR) AS stratum,
           CAST(n_s AS BIGINT) AS n_s, CAST(n1 AS BIGINT) AS n_treated,
           CAST(n0 AS BIGINT) AS n_control,
           CAST(y1_ppm AS BIGINT) AS y1_ppm,
           CAST(y0_ppm AS BIGINT) AS y0_ppm,
           CAST(diff_ppm AS BIGINT) AS diff_ppm
         FROM w2
         UNION ALL
         SELECT '__ate__', CAST(sum(n_s) AS BIGINT),
           CAST(sum(n1) AS BIGINT), CAST(sum(n0) AS BIGINT), 0, 0,
           CAST(sum(n_s * diff_ppm) // sum(n_s) AS BIGINT)
         FROM w2""")
}
