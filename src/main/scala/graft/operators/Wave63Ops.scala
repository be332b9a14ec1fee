package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 63: probabilistic record linkage and rank-agreement
  * audits — the two classic "are these the same?" questions a curation
  * fleet asks of its upstream feeds (reference: the resolver join of
  * `pipeline/resolve.py:55-90` decides identity by exact key; this wave
  * adds the Fellegi–Sunter probabilistic tier used when keys are dirty)
  * plus the Kendall-tau agreement metric for comparing two ranking
  * policies over the same population.
  */
object Wave63Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q313: Fellegi–Sunter probabilistic record linkage ------------
    // Two noisy views of the customer feed (B lowercases 1/13 of the
    // names, blanks 1/7 of the segments, shifts 1/11 of the balance
    // buckets; each side drops a different 1/17 vs 1/19 slice).
    // u-probabilities are ESTIMATED FROM THE DATA — per-field value
    // frequencies joined A×B give Σ fA(v)·fB(v) agreeing pairs over
    // den = |A|·|B| random pairs; m is pinned at 19/20. Agreement /
    // disagreement weights are micro-nat log-likelihood ratios
    // (exact-integer ln discipline, identical expression text both
    // engines); the weight frame is ONE row crossed in via broadcast.
    //
    // CANDIDATES: multi-pass SORTED NEIGHBORHOOD inside the nation
    // block — both sides union into one frame, ranked per nation by
    // two canonicalized sort keys (lower(name) then balance-bucket;
    // balance-bucket then lower(name)), and each record pairs with the
    // next w=8 cross-side records under each ordering (explode of
    // rank offsets → pure equi-join, no range join). Candidates are
    // therefore O(n·w) AT ANY CORPUS SIZE. Round 6 blocked on nation
    // alone: block COUNT is fixed (25), so block sizes — and the
    // scored pair set — grew quadratically; the round-7 sf1 run
    // measured it at 60× for 10× data (88 s), the single worst
    // scale-up in the suite, and the output itself (16M weak
    // candidates) was the quadratic artifact. Multi-pass SNM is the
    // method's own classic fix: the lower(nm) pass finds name-evidence
    // pairs (including the lowercased mutants — the sort key is
    // canonicalized precisely so case noise stays adjacent), the bb
    // pass finds balance-evidence pairs, and weak seg-only pairs that
    // the quadratic form enumerated only to score below threshold are
    // never generated.
    "q313_fellegi_sunter_linkage" -> ((s, d) => {
      val c = table(s, d, "customer").select(
        col("c_custkey").cast("long").as("k"),
        col("c_name").as("nm"),
        col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("long").as("nat"),
        expr("CAST(floor(c_acctbal * 100) AS BIGINT) div 100000").as("bb"))
      val a = c.filter(col("k") % 19 =!= 0).select(
        col("k").as("a_key"), col("nat"),
        col("nm").as("nm_a"), col("seg").as("seg_a"), col("bb").as("bb_a"))
      val b = c.filter(col("k") % 17 =!= 0).select(
        col("k").as("b_key"), col("nat").as("nat_b"),
        when(col("k") % 13 === 0, lower(col("nm")))
          .otherwise(col("nm")).as("nm_b"),
        when(col("k") % 7 === 0, lit("UNKNOWN"))
          .otherwise(col("seg")).as("seg_b"),
        (col("bb") + when(col("k") % 11 === 0, lit(1L))
          .otherwise(lit(0L))).as("bb_b"))
      // Σ fA(v)·fB(v): the number of value-agreeing pairs in the full
      // A×B cross product, computed from the two frequency frames —
      // never from the pairs themselves.
      def overlap(ca: String, cb: String, out: String): DataFrame =
        a.groupBy(col(ca).as("v")).agg(count(lit(1)).as("fa"))
          .join(b.groupBy(col(cb).as("v")).agg(count(lit(1)).as("fb")), "v")
          .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as(out))
      val w = overlap("nm_a", "nm_b", "num_nm")
        .crossJoin(overlap("seg_a", "seg_b", "num_seg"))
        .crossJoin(overlap("bb_a", "bb_b", "num_bb"))
        .crossJoin(a.agg(count(lit(1)).as("na")))
        .crossJoin(b.agg(count(lit(1)).as("nb")))
        .withColumn("den", col("na") * col("nb"))
        .selectExpr(
          "CAST(floor(ln((19.0 * den) / (20.0 * num_nm)) * 1000000) AS BIGINT) AS w_nm_pos",
          "CAST(floor(ln((1.0 * den) / (20.0 * (den - num_nm))) * 1000000) AS BIGINT) AS w_nm_neg",
          "CAST(floor(ln((19.0 * den) / (20.0 * num_seg)) * 1000000) AS BIGINT) AS w_seg_pos",
          "CAST(floor(ln((1.0 * den) / (20.0 * (den - num_seg))) * 1000000) AS BIGINT) AS w_seg_neg",
          "CAST(floor(ln((19.0 * den) / (20.0 * num_bb)) * 1000000) AS BIGINT) AS w_bb_pos",
          "CAST(floor(ln((1.0 * den) / (20.0 * (den - num_bb))) * 1000000) AS BIGINT) AS w_bb_neg")
      val u = a.select(col("a_key").as("key"), col("nat"),
          col("nm_a").as("nm"), col("bb_a").as("bb"), lit(0).as("side"))
        .unionByName(b.select(col("b_key").as("key"),
          col("nat_b").as("nat"), col("nm_b").as("nm"),
          col("bb_b").as("bb"), lit(1).as("side")))
      val o1 = Window.partitionBy("nat")
        .orderBy(lower(col("nm")), col("bb"), col("key"), col("side"))
      val o2 = Window.partitionBy("nat")
        .orderBy(col("bb"), lower(col("nm")), col("key"), col("side"))
      // ranked frame feeds 4 consumers (2 passes × 2 sides): persist
      // eagerly; released at the harness boundary
      // (GraftSession.releaseQueryCaches).
      val r = u.withColumn("rn1", row_number().over(o1))
        .withColumn("rn2", row_number().over(o2))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count()
      def passPairs(rn: String): DataFrame = {
        val l = r.select(col("nat"), col("key").as("lk"),
          col("side").as("ls"), col(rn).as("rn_l"))
          .withColumn("d", explode(expr("sequence(1, 8)")))
          .select(col("nat"), col("lk"), col("ls"),
            (col("rn_l") + col("d")).as("rn_r"))
        val rt = r.select(col("nat"), col("key").as("rk"),
          col("side").as("rs"), col(rn).as("rn_r"))
        l.join(rt, Seq("nat", "rn_r"))
          .filter(col("ls") =!= col("rs"))
          .select(when(col("ls") === 0, col("lk")).otherwise(col("rk"))
            .as("a_key"),
            when(col("ls") === 0, col("rk")).otherwise(col("lk"))
              .as("b_key"))
      }
      val cand = passPairs("rn1").unionByName(passPairs("rn2")).distinct()
      cand.join(a, "a_key").join(b, "b_key")
        .crossJoin(broadcast(w))
        .withColumn("name_ag", (col("nm_a") === col("nm_b")).cast("long"))
        .withColumn("seg_ag", (col("seg_a") === col("seg_b")).cast("long"))
        .withColumn("bb_ag", (col("bb_a") === col("bb_b")).cast("long"))
        .withColumn("score",
          col("name_ag") * col("w_nm_pos") +
            (lit(1L) - col("name_ag")) * col("w_nm_neg") +
            col("seg_ag") * col("w_seg_pos") +
            (lit(1L) - col("seg_ag")) * col("w_seg_neg") +
            col("bb_ag") * col("w_bb_pos") +
            (lit(1L) - col("bb_ag")) * col("w_bb_neg"))
        .filter(col("score") > 0)
        .select(col("a_key"), col("b_key"), col("name_ag"), col("seg_ag"),
          col("bb_ag"), col("score"),
          (col("a_key") === col("b_key")).cast("long").as("true_match"))
    }),

    // ---- q314: per-nation Kendall-tau rank agreement -------------------
    // Two ranking policies over the same customers — wealth (account
    // balance) vs activity (order count) — compared per nation by exact
    // Kendall tau: row_number ranks (no ties by construction), top-50
    // per block so the pair stage is ≤ C(50,2) = 1225 pairs per nation
    // at ANY corpus size; tau_ppm = (C − D)·1e6 div pairs in pure
    // integers. The partitioned window ranks within a 25-value nation
    // key — at real scale the top-50 pre-filter swaps for the q93
    // two-phase distributed rank so no single partition sees a nation's
    // full population; the pair self-join is block-bounded either way.
    "q314_kendall_rank_agreement" -> ((s, d) => {
      val c = table(s, d, "customer").select(
        col("c_custkey").cast("long").as("ck"),
        col("c_nationkey").cast("long").as("nat"),
        expr("CAST(floor(c_acctbal * 100) AS BIGINT)").as("cents"))
      val vol = table(s, d, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).as("n_ord"))
      val ranked = c.join(vol, Seq("ck"), "left")
        .na.fill(0L, Seq("n_ord"))
        .withColumn("r1", row_number().over(
          Window.partitionBy("nat").orderBy(col("cents").desc, col("ck"))))
        .filter(col("r1") <= 50)
        .withColumn("r2", row_number().over(
          Window.partitionBy("nat").orderBy(col("n_ord").desc, col("ck"))))
      val a = ranked.select(col("nat"), col("ck").as("ck_a"),
        col("r1").as("r1_a"), col("r2").as("r2_a"))
      val b = ranked.select(col("nat").as("nat_b"), col("ck").as("ck_b"),
        col("r1").as("r1_b"), col("r2").as("r2_b"))
      val pairs = a.join(b,
          col("nat") === col("nat_b") && col("ck_a") < col("ck_b"))
        .select(col("nat"),
          ((col("r1_a") < col("r1_b")) === (col("r2_a") < col("r2_b")))
            .cast("long").as("conc"))
        .groupBy("nat")
        .agg(sum("conc").as("c_pairs"), count(lit(1)).as("n_pairs"))
      ranked.groupBy("nat").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .join(pairs, "nat")
        .select(col("nat"), col("n"), col("c_pairs").as("conc"),
          (col("n_pairs") - col("c_pairs")).as("disc"),
          expr("((2 * c_pairs - n_pairs) * 1000000) div n_pairs")
            .as("tau_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q313_fellegi_sunter_linkage" ->
      """WITH c AS (
           SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS nm,
             c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nat,
             CAST(floor(c_acctbal * 100) AS BIGINT) // 100000 AS bb
           FROM customer),
         a AS (
           SELECT k AS a_key, nat, nm AS nm_a, seg AS seg_a, bb AS bb_a
           FROM c WHERE k % 19 <> 0),
         b AS (
           SELECT k AS b_key, nat AS nat_b,
             CASE WHEN k % 13 = 0 THEN lower(nm) ELSE nm END AS nm_b,
             CASE WHEN k % 7 = 0 THEN 'UNKNOWN' ELSE seg END AS seg_b,
             bb + CASE WHEN k % 11 = 0 THEN 1 ELSE 0 END AS bb_b
           FROM c WHERE k % 17 <> 0),
         ov_nm AS (
           SELECT coalesce(sum(fa * fb), 0) AS num_nm FROM
             (SELECT nm_a AS v, count(*) AS fa FROM a GROUP BY 1) x
             JOIN (SELECT nm_b AS v, count(*) AS fb FROM b GROUP BY 1) y
             USING (v)),
         ov_seg AS (
           SELECT coalesce(sum(fa * fb), 0) AS num_seg FROM
             (SELECT seg_a AS v, count(*) AS fa FROM a GROUP BY 1) x
             JOIN (SELECT seg_b AS v, count(*) AS fb FROM b GROUP BY 1) y
             USING (v)),
         ov_bb AS (
           SELECT coalesce(sum(fa * fb), 0) AS num_bb FROM
             (SELECT bb_a AS v, count(*) AS fa FROM a GROUP BY 1) x
             JOIN (SELECT bb_b AS v, count(*) AS fb FROM b GROUP BY 1) y
             USING (v)),
         w AS (
           SELECT
             CAST(floor(ln((19.0 * den) / (20.0 * num_nm)) * 1000000) AS BIGINT) AS w_nm_pos,
             CAST(floor(ln((1.0 * den) / (20.0 * (den - num_nm))) * 1000000) AS BIGINT) AS w_nm_neg,
             CAST(floor(ln((19.0 * den) / (20.0 * num_seg)) * 1000000) AS BIGINT) AS w_seg_pos,
             CAST(floor(ln((1.0 * den) / (20.0 * (den - num_seg))) * 1000000) AS BIGINT) AS w_seg_neg,
             CAST(floor(ln((19.0 * den) / (20.0 * num_bb)) * 1000000) AS BIGINT) AS w_bb_pos,
             CAST(floor(ln((1.0 * den) / (20.0 * (den - num_bb))) * 1000000) AS BIGINT) AS w_bb_neg
           FROM ov_nm, ov_seg, ov_bb,
             (SELECT CAST((SELECT count(*) FROM a) AS BIGINT)
                * (SELECT count(*) FROM b) AS den)),
         u AS (
           SELECT a_key AS key, nat, nm_a AS nm, bb_a AS bb, 0 AS side
           FROM a
           UNION ALL
           SELECT b_key, nat_b, nm_b, bb_b, 1 FROM b),
         r AS (
           SELECT u.*,
             row_number() OVER (PARTITION BY nat
               ORDER BY lower(nm), bb, key, side) AS rn1,
             row_number() OVER (PARTITION BY nat
               ORDER BY bb, lower(nm), key, side) AS rn2
           FROM u),
         ds AS (SELECT unnest(range(1, 9)) AS d),
         cand AS (
           SELECT DISTINCT
             CASE WHEN l.side = 0 THEN l.key ELSE r2.key END AS a_key,
             CASE WHEN l.side = 0 THEN r2.key ELSE l.key END AS b_key
           FROM (
             SELECT l.nat, l.key, l.side, l.rn1 + ds.d AS rn_r, 1 AS pass
             FROM r l, ds
             UNION ALL
             SELECT l.nat, l.key, l.side, l.rn2 + ds.d, 2
             FROM r l, ds) l
           JOIN r r2 ON r2.nat = l.nat
             AND ((l.pass = 1 AND r2.rn1 = l.rn_r)
               OR (l.pass = 2 AND r2.rn2 = l.rn_r))
           WHERE l.side <> r2.side),
         scored AS (
           SELECT a_key, b_key,
             CASE WHEN nm_a = nm_b THEN 1 ELSE 0 END AS name_ag,
             CASE WHEN seg_a = seg_b THEN 1 ELSE 0 END AS seg_ag,
             CASE WHEN bb_a = bb_b THEN 1 ELSE 0 END AS bb_ag,
             w_nm_pos, w_nm_neg, w_seg_pos, w_seg_neg, w_bb_pos, w_bb_neg
           FROM cand JOIN a USING (a_key) JOIN b USING (b_key), w)
         SELECT a_key, b_key,
           CAST(name_ag AS BIGINT) AS name_ag,
           CAST(seg_ag AS BIGINT) AS seg_ag,
           CAST(bb_ag AS BIGINT) AS bb_ag,
           CAST(name_ag * w_nm_pos + (1 - name_ag) * w_nm_neg
             + seg_ag * w_seg_pos + (1 - seg_ag) * w_seg_neg
             + bb_ag * w_bb_pos + (1 - bb_ag) * w_bb_neg AS BIGINT) AS score,
           CAST(CASE WHEN a_key = b_key THEN 1 ELSE 0 END AS BIGINT)
             AS true_match
         FROM scored
         WHERE name_ag * w_nm_pos + (1 - name_ag) * w_nm_neg
             + seg_ag * w_seg_pos + (1 - seg_ag) * w_seg_neg
             + bb_ag * w_bb_pos + (1 - bb_ag) * w_bb_neg > 0""",

    "q314_kendall_rank_agreement" ->
      """WITH c AS (
           SELECT CAST(c_custkey AS BIGINT) AS ck,
             CAST(c_nationkey AS BIGINT) AS nat,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         v AS (SELECT o_custkey AS ck, count(*) AS n_ord
               FROM orders GROUP BY 1),
         j AS (SELECT c.ck, c.nat, c.cents, coalesce(v.n_ord, 0) AS n_ord
               FROM c LEFT JOIN v ON c.ck = v.ck),
         r1 AS (SELECT ck, nat, n_ord,
                  row_number() OVER (PARTITION BY nat
                    ORDER BY cents DESC, ck) AS r1
                FROM j),
         top AS (SELECT * FROM r1 WHERE r1 <= 50),
         rk AS (SELECT ck, nat, r1,
                  row_number() OVER (PARTITION BY nat
                    ORDER BY n_ord DESC, ck) AS r2
                FROM top),
         p AS (
           SELECT a.nat,
             CASE WHEN (a.r1 < b.r1) = (a.r2 < b.r2) THEN 1 ELSE 0 END
               AS conc
           FROM rk a JOIN rk b ON a.nat = b.nat AND a.ck < b.ck),
         agg AS (SELECT nat, sum(conc) AS c_pairs, count(*) AS n_pairs
                 FROM p GROUP BY 1),
         nn AS (SELECT nat, count(*) AS n FROM rk GROUP BY 1)
         SELECT nn.nat, CAST(nn.n AS BIGINT) AS n,
           CAST(agg.c_pairs AS BIGINT) AS conc,
           CAST(agg.n_pairs - agg.c_pairs AS BIGINT) AS disc,
           CAST(((2 * agg.c_pairs - agg.n_pairs) * 1000000) // agg.n_pairs
             AS BIGINT) AS tau_ppm
         FROM nn JOIN agg ON nn.nat = agg.nat
         WHERE nn.n >= 2""")
}
