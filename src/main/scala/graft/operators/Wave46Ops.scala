package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 46: hierarchy rollups — recursive-CTE workloads
  * re-expressed as bounded relational plans.
  *
  *   - q277 subtree rollup over an implicit binary hierarchy: every
  *     ancestor's subtree total from ONE bounded explode — the
  *     org-chart/category-tree aggregation without recursion.
  *   - q278 hierarchical distinct-count rollup with mergeable KMV
  *     sketches: nation → region → global from one pass, estimates
  *     next to exact — the sketch-algebra cube a 100 TB warehouse
  *     uses where exact distinct cubes are unaffordable.
  */
object Wave46Ops {

  type Q = (SparkSession, String) => DataFrame

  private val K = 64

  val queries: Map[String, Q] = Map(
    // ---- q277: subtree rollup via ancestor explosion --------------------
    // Hierarchy: node = user_id + 1, parent = node >> 1 (an implicit
    // binary tree — stands in for any hierarchy whose ancestor chain
    // is enumerable). The recursive-CTE formulation becomes ONE
    // explode: each per-user row replicates to its ≤ ⌈log2 n⌉
    // ancestors (n >> k, strictly decreasing until 0), then one
    // ancestor-keyed rollup. Fan-out is the DEPTH, not the node
    // count, so the plan is linear at any scale — and the corpus is
    // reduced to per-user rows BEFORE the explode. Nodes ≤ 15 (the
    // top 4 levels) are reported.
    "q277_subtree_rollup" -> ((s, d) => {
      val perUser = table(s, d, "events")
        .select((col("user_id") + 1).as("node"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy("node")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
      perUser
        .select(explode(expr(
          "transform(sequence(0, 20), k -> shiftright(node, k))"))
          .as("anc"), col("n_events"), col("cents"))
        .filter(col("anc") >= 1 && col("anc") <= 15)
        .groupBy(col("anc").as("node"))
        .agg(count(lit(1)).as("n_desc_users"),
          sum("n_events").as("n_events"),
          sum("cents").as("subtree_cents"))
    }),

    // ---- q278: hierarchical KMV distinct rollup -------------------------
    // Distinct ordering customers per nation, region, and globally.
    // The nation level aggregates the corpus ONCE into ≤ K-long
    // sketches (KmvMinK — map-side combined, at most K longs per
    // group cross the wire); the region and global levels re-aggregate
    // the EXPLODED nation sketches — bottom-k of a union of bottom-ks
    // IS the union's bottom-k, so the coarser estimates are computed
    // without touching the corpus again. Exact counts ride alongside
    // for the audit column. Estimate = (K−1)/(kth/2^52), q60's
    // estimator on the md5-13-hex hash both engines share.
    "q278_sketch_rollup" -> ((s, d) => {
      val base = table(s, d, "orders")
        .join(broadcast(table(s, d, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name"), col("r_name"), col("o_custkey").as("ck"),
          conv(substring(md5(col("o_custkey").cast("string")), 1, 13),
            16, 10).cast("long").as("hv"))
      val kmv = udaf(new graft.functions.KmvMinK(K))
      def est(arr: org.apache.spark.sql.Column) =
        round(lit((K - 1).toDouble) /
          (element_at(arr, least(size(arr), lit(K))).cast("double") /
            lit(4503599627370496.0)), 4)
      val nat = base.groupBy("r_name", "n_name")
        .agg(kmv(col("hv")).as("arr"), countDistinct("ck").as("exact"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // The exact audit counts roll up ADDITIVELY from the nation
      // level: ck → nation is functional (orders ⋈ customer ⋈ nation
      // gives every custkey exactly one n_name), so the per-nation
      // distinct-ck sets partition the per-region and global ones —
      // sum(exact) over nat IS countDistinct(ck) per region / global.
      // The former shape re-aggregated the whole corpus once per level
      // (two extra full countDistinct exchanges over base); now only
      // the nation pass touches the corpus, mirroring how the KMV
      // sketches themselves roll up (guide §2.4). Values identical.
      val regExact = nat.groupBy("r_name").agg(sum("exact").as("exact"))
      val reg = nat.select(col("r_name"), explode(col("arr")).as("hv"))
        .groupBy("r_name").agg(kmv(col("hv")).as("arr"))
        .join(broadcast(regExact), "r_name")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val globExact = regExact.agg(sum("exact").as("exact"))
      val glob = reg.select(explode(col("arr")).as("hv"))
        .agg(kmv(col("hv")).as("arr"))
        .crossJoin(broadcast(globExact))
      nat.select(lit("nation").as("level"), col("n_name").as("key"),
          col("exact"), est(col("arr")).as("kmv_est"))
        .unionByName(reg.select(lit("region").as("level"),
          col("r_name").as("key"), col("exact"),
          est(col("arr")).as("kmv_est")))
        .unionByName(glob.select(lit("global").as("level"),
          lit("ALL").as("key"), col("exact"),
          est(col("arr")).as("kmv_est")))
    }))

  val oracle: Map[String, String] = Map(
    "q277_subtree_rollup" ->
      """WITH pu AS (
           SELECT user_id + 1 AS node, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
           FROM events GROUP BY 1),
         anc AS (
           SELECT node >> k AS anc, n_events, cents
           FROM pu, (SELECT unnest(range(0, 21)) AS k)
           WHERE node >> k >= 1 AND node >> k <= 15)
         SELECT anc AS node, count(*) AS n_desc_users,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS subtree_cents
         FROM anc GROUP BY anc""",

    "q278_sketch_rollup" ->
      """WITH base AS (
           SELECT n_name, r_name, o_custkey AS ck,
             CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13))
               AS BIGINT) AS hv
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         dn AS (SELECT DISTINCT r_name, n_name, hv FROM base),
         kn AS (
           SELECT r_name, n_name, max(hv) AS kth FROM (
             SELECT r_name, n_name, hv, row_number() OVER (
               PARTITION BY r_name, n_name ORDER BY hv) AS rn
             FROM dn) WHERE rn <= 64 GROUP BY 1, 2),
         kr AS (
           SELECT r_name, max(hv) AS kth FROM (
             SELECT r_name, hv, row_number() OVER (
               PARTITION BY r_name ORDER BY hv) AS rn
             FROM (SELECT DISTINCT r_name, hv FROM base))
           WHERE rn <= 64 GROUP BY 1),
         kg AS (
           SELECT max(hv) AS kth FROM (
             SELECT hv, row_number() OVER (ORDER BY hv) AS rn
             FROM (SELECT DISTINCT hv FROM base)) WHERE rn <= 64),
         en AS (SELECT r_name, n_name, count(DISTINCT ck) AS exact
                FROM base GROUP BY 1, 2),
         er AS (SELECT r_name, count(DISTINCT ck) AS exact
                FROM base GROUP BY 1),
         eg AS (SELECT count(DISTINCT ck) AS exact FROM base)
         SELECT 'nation' AS level, kn.n_name AS key, en.exact,
           round(63.0 / (CAST(kn.kth AS DOUBLE) / 4503599627370496.0), 4)
             AS kmv_est
         FROM kn JOIN en ON kn.r_name = en.r_name AND kn.n_name = en.n_name
         UNION ALL
         SELECT 'region', kr.r_name, er.exact,
           round(63.0 / (CAST(kr.kth AS DOUBLE) / 4503599627370496.0), 4)
         FROM kr JOIN er ON kr.r_name = er.r_name
         UNION ALL
         SELECT 'global', 'ALL', eg.exact,
           round(63.0 / (CAST(kg.kth AS DOUBLE) / 4503599627370496.0), 4)
         FROM kg CROSS JOIN eg""")
}
