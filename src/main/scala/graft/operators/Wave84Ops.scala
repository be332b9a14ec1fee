package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 84: incremental maintenance beyond additive aggs —
  * two-sided JOIN-view delta rules (fact inserts AND dimension
  * updates folded into the old view state without re-joining the
  * base), and selective re-aggregation of MIN (a non-invertible
  * aggregate) under deletes: only groups whose minimum was actually
  * deleted re-scan. The DuckDB oracles compute both views by FULL
  * recompute over the new state — the hash match IS the proof the
  * delta rules are exact.
  */
object Wave84Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q355: two-sided incremental join-view maintenance -------------
    // View V = Σ per priority of (order cents + customer balance
    // cents) over orders⋈customer. Old state: orders slice O₀
    // (key%5≠0), customers C₀; the batch applies ΔO (the %5=0 order
    // inserts) and ΔC (customers key%7=0 gain +1000 cents). Delta
    // rules: V₁ = V₀ + ΔO⋈C₁ + O₀⋈Δm(C) where Δm is the per-customer
    // measure CHANGE (+1000) — three key-partitioned joins touching
    // only delta-sized or old-view frames, never a re-join of the full
    // new state. The oracle recomputes O₁⋈C₁ from scratch; hash
    // equality certifies the rules.
    "q355_join_view_ivm" -> ((s, d) => {
      val o = table(s, d, "orders").select(col("o_orderkey").as("ok"),
        col("o_custkey").as("ck"), col("o_orderpriority").as("prio"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("oc"))
      val c0 = table(s, d, "customer").select(
        col("c_custkey").cast("long").as("ck"),
        expr("CAST(floor(c_acctbal * 100) AS BIGINT)").as("bal"))
      val c1 = c0.withColumn("bal",
        col("bal") + when(col("ck") % 7 === 0, 1000L).otherwise(0L))
      val o0 = o.filter(col("ok") % 5 =!= 0)
      val dO = o.filter(col("ok") % 5 === 0)
      val v0 = o0.join(c0, "ck").groupBy("prio")
        .agg(count(lit(1)).as("n"), sum(expr("oc + bal")).as("m"))
      val dNew = dO.join(c1, "ck").groupBy("prio")
        .agg(count(lit(1)).as("dn"), sum(expr("oc + bal")).as("dm"))
      val dDim = o0.join(
          c1.filter(col("ck") % 7 === 0)
            .select(col("ck"), lit(1000L).as("dbal")), "ck")
        .groupBy("prio").agg(sum("dbal").as("ddm"))
      v0.join(dNew, Seq("prio"), "full_outer")
        .join(dDim, Seq("prio"), "full_outer")
        .na.fill(0L, Seq("n", "m", "dn", "dm", "ddm"))
        .select(col("prio"), (col("n") + col("dn")).as("n_rows"),
          (col("m") + col("dm") + col("ddm")).as("measure_cents"))
    }),

    // ---- q356: MIN maintenance under deletes (selective re-agg) --------
    // Maintained view: per part the MIN line price. The batch DELETES
    // every line with l_orderkey%11=0. MIN is not invertible, but
    // only groups whose stored minimum was deleted need a re-scan:
    // the delete batch joins the old min frame (key-partitioned),
    // splits groups into untouched / touched-but-min-survives /
    // min-invalidated, and ONLY the invalidated groups re-aggregate
    // from surviving rows. Output: the audit counts plus a 64-bucket
    // residue checksum of the new min frame (so the oracle's full
    // recompute hash-checks every new minimum, not just the counts).
    "q356_min_maintenance_deletes" -> ((s, d) => {
      val li = table(s, d, "lineitem").select(
        col("l_partkey").as("pk"), col("l_orderkey").as("ok"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("pc"))
      val oldMin = li.groupBy("pk").agg(min("pc").as("mn"))
      val del = li.filter(col("ok") % 11 === 0)
      val keep = li.filter(col("ok") % 11 =!= 0)
      val delMin = del.groupBy("pk").agg(min("pc").as("dmn"))
      val classed = oldMin.join(delMin, Seq("pk"), "left")
        .withColumn("cls", expr(
          """CASE WHEN dmn IS NULL THEN 'untouched'
                  WHEN dmn > mn THEN 'min_survives'
                  ELSE 'invalidated' END"""))
      val invalidated = classed.filter(col("cls") === "invalidated")
        .select("pk")
      // selective re-aggregation: ONLY invalidated groups re-scan
      val recomputed = keep.join(invalidated, Seq("pk"), "left_semi")
        .groupBy("pk").agg(min("pc").as("mn"))
      val unchanged = classed.filter(col("cls") =!= "invalidated")
        .select(col("pk"), col("mn"))
      val newMin = unchanged.unionByName(recomputed)
      val counts = classed.groupBy()
        .pivot("cls", Seq("untouched", "min_survives", "invalidated"))
        .agg(count(lit(1))).na.fill(0L)
      newMin
        .select((col("pk") % 64).as("bucket"),
          (col("mn") % 1000000007L).as("res"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_groups"),
          (sum("res") % 1000000007L).as("checksum"))
        .crossJoin(broadcast(counts.select(
          col("untouched").as("n_untouched"),
          col("min_survives").as("n_min_survives"),
          col("invalidated").as("n_invalidated"))))
    }))

  val oracle: Map[String, String] = Map(
    // FULL recompute of the new state — no delta rules.
    "q355_join_view_ivm" ->
      """WITH o1 AS (
           SELECT o_custkey AS ck, o_orderpriority AS prio,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS oc
           FROM orders),
         c1 AS (
           SELECT CAST(c_custkey AS BIGINT) AS ck,
             CAST(floor(c_acctbal * 100) AS BIGINT)
               + CASE WHEN c_custkey % 7 = 0 THEN 1000 ELSE 0 END
               AS bal
           FROM customer)
         SELECT prio, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(oc + bal) AS BIGINT) AS measure_cents
         FROM o1 JOIN c1 USING (ck)
         GROUP BY prio""",

    // FULL recompute of the post-delete min frame; audit counts
    // re-derived from the old/delete states directly.
    "q356_min_maintenance_deletes" ->
      """WITH li AS (
           SELECT l_partkey AS pk, l_orderkey AS ok,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc
           FROM lineitem),
         oldmin AS (SELECT pk, min(pc) AS mn FROM li GROUP BY 1),
         delmin AS (SELECT pk, min(pc) AS dmn FROM li
                    WHERE ok % 11 = 0 GROUP BY 1),
         classed AS (
           SELECT oldmin.pk,
             CASE WHEN dmn IS NULL THEN 'untouched'
                  WHEN dmn > mn THEN 'min_survives'
                  ELSE 'invalidated' END AS cls
           FROM oldmin LEFT JOIN delmin USING (pk)),
         cnt AS (
           SELECT
             sum(CASE WHEN cls = 'untouched' THEN 1 ELSE 0 END)
               AS n_untouched,
             sum(CASE WHEN cls = 'min_survives' THEN 1 ELSE 0 END)
               AS n_min_survives,
             sum(CASE WHEN cls = 'invalidated' THEN 1 ELSE 0 END)
               AS n_invalidated
           FROM classed),
         newmin AS (
           SELECT pk, min(pc) AS mn FROM li WHERE ok % 11 <> 0
           GROUP BY 1)
         SELECT pk % 64 AS bucket, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(mn % 1000000007) % 1000000007 AS BIGINT)
             AS checksum,
           CAST(n_untouched AS BIGINT) AS n_untouched,
           CAST(n_min_survives AS BIGINT) AS n_min_survives,
           CAST(n_invalidated AS BIGINT) AS n_invalidated
         FROM newmin, cnt
         GROUP BY 1, n_untouched, n_min_survives, n_invalidated""")
}
