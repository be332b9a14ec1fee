package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-7 wave 100:
  *
  *  - q388 nearest-direction as-of join: the third as-of direction
  *    (after the native backward q114 and forward q201), composed
  *    algebraically from BOTH native AsOfJoinExec passes — per purchase
  *    the closer of nearest-preceding and nearest-following click, ties
  *    to backward. Four key exchanges + two sorted merges total, each
  *    spill-free O(1)-state — still the plan you'd run at 100 TB.
  *  - q390 reachability profile with a KMV audit: exact |N<=2(v)| for a
  *    fixed seed cohort next to the KMV (bottom-k-by-hash) estimate a
  *    HyperBall-style run would keep per node — the exact side is the
  *    audit, the sketch side is the 100 TB plan (k·|V| state instead of
  *    the full frontier closure).
  */
object Wave100Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q388: nearest as-of (single native entry point) ----------------
    // Clicks are first deduped to one per (user, ts) — max event_id,
    // making both directions' tie policies identical — then ONE
    // `AsOf.join(..., direction = "nearest")` call: the entry point
    // composes the two native passes sequentially (forward over the
    // backward output), so there is no rejoin of two result sets — the
    // round-7 ad-hoc compose paid an extra shuffle join on
    // (user, purchase). Winner = smaller absolute gap, ties to backward
    // (the "at-or-before wins" convention); purchases with no click on
    // either side keep a NULL match ('none'). The gap and the matched
    // side are read back from the matched click_ts — sign-equivalent to
    // the per-direction bookkeeping (a tie's winner has click_ts <= ts,
    // so `dir` stays 'backward' exactly when the tie rule fired).
    "q388_asof_nearest" -> ((s, d) => {
      val ev = table(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
        .select(col("user_id"), col("click_id"), col("ts").as("click_ts"))
      graft.plans.AsOf.join(purchases, clicks, Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts",
          tieBreak = Seq("click_id"), direction = "nearest")
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          when(col("click_ts").isNotNull,
            abs(col("ts") - col("click_ts"))).as("gap_ns"),
          when(col("click_ts").isNull, lit("none"))
            .when(col("click_ts") <= col("ts"), lit("backward"))
            .otherwise(lit("forward")).as("dir"))
    }),

    // ---- q390: 2-hop reachability, exact vs KMV sketch ------------------
    // Seed cohort: the even customer nodes below 400 (custkeys 1..199,
    // ~200 seeds — fixed at any corpus scale). Exact side: two bounded frontier joins + distinct
    // (the q187 shape, unrolled). Sketch side: per seed the 4 smallest
    // 60-bit hashes of reached ids — mergeable O(k) state per node, the
    // HyperBall posture — with est = (k-1)·2^60 div h4 and its error
    // against the exact count in ppm. Top-20 seeds by reach.
    "q390_reach_kmv" -> ((s, d) => {
      val eo = table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // cache the half-size eo; the symmetrized edge list is a map-only
      // projection per consumer (see the q194 round-7 plan-audit note)
      val eoM = eo
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = eoM
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val seeds = edges.filter(col("src") % 2 === 0 && col("src") < 400)
        .select(col("src").as("id")).distinct()
      val hop1 = edges
        .join(seeds.select(col("id").as("src")), "src")
        .select(col("src").as("id"), col("dst").as("r"))
      val hop2 = hop1.select(col("id"), col("r").as("src"))
        .join(edges, "src")
        .select(col("id"), col("dst").as("r"))
      val reach = hop1.unionByName(hop2)
        .filter(col("r") =!= col("id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exact = reach.groupBy("id").agg(count(lit(1)).as("n_reach"))
      val hv = reach.select(col("id"),
        expr("""CAST(conv(substring(md5(CAST(r AS STRING)), 1, 15),
               16, 10) AS BIGINT)""").as("hv"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("id").orderBy("hv")
      val h4 = hv.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 4)
        .select(col("id"), col("hv").as("h4"))
      exact.join(h4, "id") // nodes with >= 4 reached ids carry a sketch
        .withColumn("kmv_est",
          expr(s"(3 * ${1L << 60}) div h4"))
        .withColumn("err_ppm",
          expr("abs(kmv_est - n_reach) * 1000000 div n_reach"))
        .select(col("id"), col("n_reach"), col("kmv_est"), col("err_ppm"))
        .orderBy(col("n_reach").desc, col("id").asc)
        .limit(20)
    }))

  val oracle: Map[String, String] = Map(
    "q388_asof_nearest" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns
           FROM events WHERE event_type IN ('click', 'purchase')),
         c1 AS (
           SELECT user_id, tns, max(event_id) AS click_id
           FROM e WHERE event_type = 'click' GROUP BY 1, 2),
         u AS (
           SELECT user_id, tns, 0 AS isp, click_id AS eid FROM c1
           UNION ALL
           SELECT user_id, tns, 1, event_id FROM e
           WHERE event_type = 'purchase'),
         b AS (
           SELECT u.*,
             last_value(CASE WHEN isp = 0 THEN eid END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY tns, isp, eid
                     ROWS UNBOUNDED PRECEDING) AS cb_id,
             last_value(CASE WHEN isp = 0 THEN tns END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY tns, isp, eid
                     ROWS UNBOUNDED PRECEDING) AS cb_ts
           FROM u),
         f AS (
           SELECT user_id, tns, isp, eid,
             first_value(CASE WHEN isp = 0 THEN eid END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY tns, 1 - isp, eid
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS cf_id,
             first_value(CASE WHEN isp = 0 THEN tns END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY tns, 1 - isp, eid
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS cf_ts
           FROM u)
         SELECT b.user_id, b.eid AS purchase_id,
           CASE WHEN b.cb_id IS NOT NULL AND
                     (f.cf_id IS NULL OR b.tns - b.cb_ts <= f.cf_ts - b.tns)
                THEN b.cb_id ELSE f.cf_id END AS click_id,
           CASE WHEN b.cb_id IS NOT NULL AND
                     (f.cf_id IS NULL OR b.tns - b.cb_ts <= f.cf_ts - b.tns)
                THEN b.tns - b.cb_ts ELSE f.cf_ts - b.tns END AS gap_ns,
           CASE WHEN b.cb_id IS NOT NULL AND
                     (f.cf_id IS NULL OR b.tns - b.cb_ts <= f.cf_ts - b.tns)
                THEN 'backward'
                WHEN f.cf_id IS NOT NULL THEN 'forward'
                ELSE 'none' END AS dir
         FROM b JOIN f
           ON b.user_id = f.user_id AND b.eid = f.eid
             AND b.isp = 1 AND f.isp = 1""",

    "q390_reach_kmv" ->
      """WITH eo AS (
           SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM eo
                   UNION ALL SELECT dst, src FROM eo),
         seeds AS (
           SELECT DISTINCT src AS id FROM edges
           WHERE src % 2 = 0 AND src < 400),
         hop1 AS (
           SELECT s.id, e.dst AS r FROM seeds s
           JOIN edges e ON e.src = s.id),
         hop2 AS (
           SELECT h.id, e.dst AS r FROM hop1 h
           JOIN edges e ON e.src = h.r),
         reach AS (
           SELECT DISTINCT id, r FROM (
             SELECT id, r FROM hop1 UNION ALL SELECT id, r FROM hop2)
           WHERE r <> id),
         exact AS (
           SELECT id, count(*) AS n_reach FROM reach GROUP BY id),
         hv AS (
           SELECT id,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR)), 1, 15))
               AS BIGINT) AS hv
           FROM reach),
         h4 AS (
           SELECT id, hv AS h4 FROM (
             SELECT id, hv, row_number() OVER (
               PARTITION BY id ORDER BY hv) AS rn
             FROM hv)
           WHERE rn = 4)
         SELECT e.id, CAST(e.n_reach AS BIGINT) AS n_reach,
           CAST((3 * 1152921504606846976) // h4 AS BIGINT) AS kmv_est,
           CAST(abs((3 * 1152921504606846976) // h4 - e.n_reach)
             * 1000000 // e.n_reach AS BIGINT) AS err_ppm
         FROM exact e JOIN h4 USING (id)
         ORDER BY n_reach DESC, id ASC
         LIMIT 20""")
}
