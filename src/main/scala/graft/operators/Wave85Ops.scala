package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 85: business-analytics decompositions — the mix/rate
  * bridge (WHY did the mean move between two periods: segment mix
  * shift vs within-segment rate change) and the Herfindahl–Hirschman
  * concentration index per market. Both fold the corpus to
  * segment-sized frames and do exact micro/ppm integer arithmetic
  * there.
  */
object Wave85Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q357: mix/rate bridge between the two halves -------------------
    // Periods = time halves; segments = event_type. Per segment and
    // period: share (events ppm) and rate (mean cents, micro). The
    // bridge: mix effect = (share₁−share₀)·rate₀, rate effect =
    // share₁·(rate₁−rate₀) — summed over segments they reconstruct
    // Δmean exactly up to documented ppm·micro truncation (the spec
    // pins the residual bound). One corpus pass → |segments|×2 frame.
    "q357_mean_bridge" -> ((s, d) => {
      val ev = table(s, d, "events")
      val bounds = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
      val seg = ev.crossJoin(broadcast(bounds))
        .withColumn("late",
          expr("CAST(ts >= t0 + (t1 - t0) div 2 AS BIGINT)"))
        .groupBy(col("event_type").as("seg"), col("late"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("c"))
      val tot = seg.groupBy("late").agg(sum("n").as("nt"))
      val wide = seg.join(broadcast(tot), "late")
        .withColumn("share_ppm", expr("n * 1000000 div nt"))
        .withColumn("rate_micro", expr("c * 1000000 div n"))
        .groupBy("seg")
        .agg(
          max(when(col("late") === 0, col("share_ppm"))).as("share0"),
          max(when(col("late") === 0, col("rate_micro"))).as("rate0"),
          max(when(col("late") === 1, col("share_ppm"))).as("share1"),
          max(when(col("late") === 1, col("rate_micro"))).as("rate1"))
        .na.fill(0L, Seq("share0", "rate0", "share1", "rate1"))
      wide.select(col("seg"), col("share0"), col("share1"),
        col("rate0"), col("rate1"),
        expr("(share1 - share0) * rate0 div 1000000").as("mix_micro"),
        expr("share1 * (rate1 - rate0) div 1000000").as("rate_eff_micro"))
    }),

    // ---- q358: Herfindahl concentration per nation ----------------------
    // Customer spend shares within each nation; HHI = Σ share_ppm²
    // div 1e6 (micro-HHI: 1e6 = monopoly). The per-customer frame is
    // keyed (one orders fold + one dimension join); the square-sum is
    // a map-side-combinable aggregate. The "is this market one whale
    // or many small fish" readout regulators and marketplaces run.
    "q358_hhi_concentration" -> ((s, d) => {
      val spend = table(s, d, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
        .join(table(s, d, "customer").select(
          col("c_custkey").cast("long").as("ck"),
          col("c_nationkey").cast("long").as("nat")), "ck")
      val natTot = spend.groupBy("nat").agg(sum("cents").as("tot"),
        count(lit(1)).as("n_cust"))
      spend.join(broadcast(natTot), "nat")
        .withColumn("share_ppm", expr("cents * 1000000 div tot"))
        .groupBy("nat")
        .agg(max("n_cust").as("n_customers"),
          expr("sum(share_ppm * share_ppm) div 1000000")
            .as("hhi_micro"),
          max("share_ppm").as("top_share_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q357_mean_bridge" ->
      """WITH b AS (
           SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
           FROM events),
         seg AS (
           SELECT event_type AS seg,
             CASE WHEN epoch_ns(ts) >= t0 + (t1 - t0) // 2
               THEN 1 ELSE 0 END AS late,
             count(*) AS n,
             sum(CAST(floor(value * 100) AS BIGINT)) AS c
           FROM events, b GROUP BY 1, 2),
         tot AS (SELECT late, sum(n) AS nt FROM seg GROUP BY 1),
         r AS (
           SELECT seg.seg, seg.late,
             n * 1000000 // nt AS share_ppm,
             c * 1000000 // n AS rate_micro
           FROM seg JOIN tot ON seg.late = tot.late),
         wide AS (
           SELECT seg,
             coalesce(max(CASE WHEN late = 0 THEN share_ppm END), 0)
               AS share0,
             coalesce(max(CASE WHEN late = 0 THEN rate_micro END), 0)
               AS rate0,
             coalesce(max(CASE WHEN late = 1 THEN share_ppm END), 0)
               AS share1,
             coalesce(max(CASE WHEN late = 1 THEN rate_micro END), 0)
               AS rate1
           FROM r GROUP BY 1)
         SELECT seg, CAST(share0 AS BIGINT) AS share0,
           CAST(share1 AS BIGINT) AS share1,
           CAST(rate0 AS BIGINT) AS rate0,
           CAST(rate1 AS BIGINT) AS rate1,
           CAST((share1 - share0) * rate0 // 1000000 AS BIGINT)
             AS mix_micro,
           CAST(share1 * (rate1 - rate0) // 1000000 AS BIGINT)
             AS rate_eff_micro
         FROM wide""",

    "q358_hhi_concentration" ->
      """WITH spend AS (
           SELECT o_custkey AS ck,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1),
         j AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nat, cents
           FROM spend JOIN customer ON ck = c_custkey),
         t AS (SELECT nat, sum(cents) AS tot, count(*) AS n_cust
               FROM j GROUP BY 1),
         sh AS (
           SELECT j.nat, t.n_cust,
             cents * 1000000 // tot AS share_ppm
           FROM j JOIN t ON j.nat = t.nat)
         SELECT nat, CAST(max(n_cust) AS BIGINT) AS n_customers,
           CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT)
             AS hhi_micro,
           CAST(max(share_ppm) AS BIGINT) AS top_share_ppm
         FROM sh GROUP BY nat""")
}
