package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-7 wave 99: storage-layout and data-curation audits that matter
  * precisely at 100 TB —
  *
  *  - q385 space-filling-curve layout advisor: measures min/max-pruning
  *    effectiveness of a Z-ORDER file layout against leading-column
  *    lexicographic and round-robin layouts for a 2-D box predicate,
  *    entirely by VALUE bucketing (file = value range, exactly what a
  *    range-partitioned write produces) — no global row_number sort, so
  *    the simulation itself scales.
  *  - q386 kNN label-error scan: confident-learning-style audit (own
  *    label vs 5-NN majority) with ADAPTIVE sign-LSH blocking — the
  *    code length grows with the corpus (bits = bitlength((n-1) div
  *    125)), keeping expected bucket size ~constant, so the
  *    within-bucket pair stage stays LINEAR in corpus size where a
  *    fixed code would go quadratic.
  *  - q387 ER blocking-quality audit: pair completeness + reduction
  *    ratio for two blocking schemes and their union WITHOUT
  *    materializing a single candidate pair — every pair count is
  *    sum-of-C(n,2) arithmetic over group sizes, with
  *    inclusion–exclusion for the union — so the audit is one
  *    aggregation pass at any corpus size.
  */
object Wave99Ops {

  type Q = (SparkSession, String) => DataFrame

  // ---- shared: deterministic ±1 hyperplane signs (the q112 recipe) ----
  private def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Plane j's 64 signs; sign(i,j) = +1 iff md5("i:j")[0] < '8' (the
    * q112 hash-seeded plane recipe — same constants land as literals in
    * the DuckDB oracle). */
  private def planeSigns(j: Int): Seq[Float] =
    (0 until 64).map(i =>
      if (md5Hex(s"$i:$j").charAt(0) < '8') 1.0f else -1.0f)

  private def withFns(s: SparkSession): SparkSession = {
    graft.functions.GraftFunctions.register(s); s
  }

  private def fdot(a: Column, b: Column): Column =
    call_function("array_dot", a, b)

  private val NPlanes = 12 // enough bits for ~512k-vector corpora

  /** Portable Z-value of two 8-bit coordinates via pure div/% arithmetic
    * (identical text runs in Spark SQL and DuckDB — no engine bit ops,
    * no shift-overflow edge cases). Bit i of `a` lands at z-bit 2i, bit
    * i of `b` at 2i+1. */
  private def zExpr(a: String, b: String): String =
    (0 until 8).map { i =>
      s"((($a) div ${1 << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((($b) div ${1 << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  val queries: Map[String, Q] = Map(
    // ---- q385: Z-order vs lexicographic vs round-robin layout ----------
    // Coordinates: a = l_partkey % 256, b = l_suppkey % 256. Layouts
    // assign each row to a "file" by VALUE (what repartitionByRange +
    // write produces): zorder file = z div 256 (256 curve segments),
    // lex file = a (leading column ranges), round-robin file =
    // l_orderkey % 256 (ingestion order, no clustering). Per file the
    // zone map (min/max of a and b) decides whether the box predicate
    // a∈[64,127] ∧ b∈[2,5] (in-domain at every sf: suppkey spans only 0..9 at sf0.001) can skip it. One corpus scan, one
    // (layout, file) aggregation — the three layouts ride a single
    // explode, and no step sorts the corpus globally.
    "q385_zorder_layout" -> ((s, d) => {
      val li = table(s, d, "lineitem")
        .select((col("l_partkey") % 256).as("a"),
          (col("l_suppkey") % 256).as("b"),
          col("l_orderkey"))
        .withColumn("z", expr(zExpr("a", "b")))
      val tagged = li.select(col("a"), col("b"), explode(array(
        struct(lit("zorder").as("layout"), expr("z div 256").as("file")),
        struct(lit("lex").as("layout"), col("a").as("file")),
        struct(lit("roundrobin").as("layout"),
          (col("l_orderkey") % 256).as("file")))).as("lf"))
        .select(col("lf.layout").as("layout"), col("lf.file").as("file"),
          col("a"), col("b"))
      val files = tagged.groupBy("layout", "file")
        .agg(count(lit(1)).as("n_rows"),
          min("a").as("min_a"), max("a").as("max_a"),
          min("b").as("min_b"), max("b").as("max_b"))
      val matched = li
        .filter(col("a").between(64, 127) && col("b").between(2, 5))
        .agg(count(lit(1)).as("rows_matched"))
      files
        .withColumn("scanned",
          (col("max_a") >= 64 && col("min_a") <= 127 &&
            col("max_b") >= 2 && col("min_b") <= 5).cast("long"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum("scanned").as("files_scanned"),
          sum(col("scanned") * col("n_rows")).as("rows_scanned"))
        .crossJoin(broadcast(matched))
        .withColumn("scan_amplification_ppm",
          expr("rows_scanned * 1000000 div greatest(1, rows_matched)"))
        .orderBy("layout")
    }),

    // ---- q386: 5-NN majority-vote label-error scan (adaptive LSH) ------
    // Code length adapts to the corpus: bits = bitlength((n-1) div 125)
    // (>= 4), so expected bucket size stays ~125 vectors and the
    // within-bucket pair stage is O(n·125) at ANY corpus size — the
    // fixed-code variant would re-derive the all-pairs blowup as the
    // corpus grows. Neighbors = same sign-LSH bucket; per anchor the
    // top-5 by cosine (rounded, the q40 parity discipline) vote; an
    // anchor whose own label differs from a >=3-vote majority is a
    // label-error suspect (confident-learning shape). Anchors with
    // fewer than 5 bucket neighbors abstain (counted separately).
    "q386_knn_label_audit" -> ((s0, d) => {
      val s = withFns(s0)
      val e = table(s, d, "embeddings")
      val bits = e.agg(count(lit(1)).as("n"))
        .select(greatest(lit(4),
          length(bin(expr("(n - 1) div 125")))).cast("int").as("bits"))
      val projected = e.select(
        Seq(col("vec_id"), col("label"), col("embedding")) ++
          (0 until NPlanes).map { j =>
            val signs = array(planeSigns(j).map(v => lit(v)): _*)
            round(fdot(col("embedding"), signs), 6).as(s"p$j")
          }: _*)
      // Norms are PER-VECTOR, so compute sqrt(<v,v>) once per vector
      // before the bucket self-join — the former shape recomputed both
      // self-dots for EVERY candidate pair, tripling the pair stage's
      // dot-product work (guide §1.2 step 1: don't recompute what a
      // cheaper grain already has). Same IEEE ops per pair (sqrt then
      // multiply, round at the end) — cos_r is bit-identical.
      val bucketed = projected.crossJoin(broadcast(bits))
        .withColumn("bucket", expr((0 until NPlanes).map { j =>
          s"CASE WHEN $j < bits AND p$j >= 0 THEN ${1 << j} ELSE 0 END"
        }.mkString(" + ")))
        .select(col("vec_id"), col("label"), col("embedding"),
          sqrt(fdot(col("embedding"), col("embedding"))).as("nrm"),
          col("bucket"))
      val a = bucketed.select(col("vec_id").as("a_id"),
        col("label").as("a_label"), col("embedding").as("a_vec"),
        col("nrm").as("a_nrm"), col("bucket"))
      val b = bucketed.select(col("vec_id").as("b_id"),
        col("label").as("b_label"), col("embedding").as("b_vec"),
        col("nrm").as("b_nrm"), col("bucket"))
      val pairs = a.join(b, "bucket").filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("a_label"), col("b_id"), col("b_label"),
          round(fdot(col("a_vec"), col("b_vec")) /
            (col("a_nrm") * col("b_nrm")), 6).as("cos_r"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("a_id")
        .orderBy(col("cos_r").desc, col("b_id").asc)
      val top5 = pairs.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
      val full5 = top5.groupBy("a_id").agg(count(lit(1)).as("k"))
        .filter(col("k") === 5).select("a_id")
      val votes = top5.join(full5, "a_id")
        .groupBy("a_id", "a_label", "b_label")
        .agg(count(lit(1)).as("c"))
      val maj = votes.groupBy("a_id", "a_label")
        .agg(max(struct(col("c"), (-col("b_label")).as("nl"))).as("m"))
        .select(col("a_id"), col("a_label"),
          (-col("m.nl")).as("maj_label"), col("m.c").as("maj_c"))
      maj
        .withColumn("suspect",
          (col("maj_label") =!= col("a_label") && col("maj_c") >= 3)
            .cast("long"))
        .groupBy(col("a_label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_anchors"),
          sum("suspect").as("n_suspect"))
        .withColumn("suspect_ppm",
          expr("n_suspect * 1000000 div n_anchors"))
        .orderBy("label")
    }),

    // ---- q387: blocking-quality audit without materializing pairs ------
    // Truth (declared match relation): same (c_nationkey,
    // cents(c_acctbal) div 1000). Scheme B1 blocks on cents div 3000
    // (boundary crossings lose true pairs); scheme B2 blocks on
    // (c_nationkey, c_mktsegment) (segment disagreement loses true
    // pairs). Every metric is exact sum-of-C(n,2) arithmetic over
    // group sizes; the UNION scheme's candidate count and coverage use
    // inclusion–exclusion over the (B1, B2) pair grouping. Zero
    // candidate pairs are ever materialized — the audit is O(corpus),
    // which is the whole point of auditing blocking BEFORE running ER.
    "q387_blocking_quality" -> ((s, d) => {
      val c = table(s, d, "customer").select(
        col("c_nationkey").cast("long").as("nat"),
        col("c_mktsegment").as("seg"),
        expr("CAST(floor(c_acctbal * 100) AS BIGINT)").as("cents"))
        .withColumn("truth_k", expr("cents div 1000"))
        .withColumn("b1", expr("cents div 3000"))
      val pairSum = expr("sum(n * (n - 1) div 2)")
      val n = c.agg(count(lit(1)).as("n"))
        .select(expr("n * (n - 1) div 2").as("all_pairs"))
      // candidate-pair counts per scheme (block-size arithmetic)
      val cand1 = c.groupBy("b1").agg(count(lit(1)).as("n"))
        .agg(pairSum.as("cand")).withColumn("scheme", lit("b1"))
      val cand2 = c.groupBy("nat", "seg").agg(count(lit(1)).as("n"))
        .agg(pairSum.as("cand")).withColumn("scheme", lit("b2"))
      val candBoth = c.groupBy("b1", "nat", "seg")
        .agg(count(lit(1)).as("n"))
        .agg(pairSum.as("cand_both"))
      val candU = cand1.select(col("cand").as("c1"))
        .crossJoin(broadcast(cand2.select(col("cand").as("c2"))))
        .crossJoin(broadcast(candBoth))
        .select((col("c1") + col("c2") - col("cand_both")).as("cand"))
        .withColumn("scheme", lit("union"))
      // true-pair coverage per scheme (same arithmetic on truth groups)
      val truth = c.groupBy("nat", "truth_k").agg(count(lit(1)).as("n"))
        .agg(pairSum.as("true_pairs"))
      val cov1 = c.groupBy("nat", "truth_k", "b1")
        .agg(count(lit(1)).as("n"))
        .agg(pairSum.as("covered")).withColumn("scheme", lit("b1"))
      val cov2 = c.groupBy("nat", "truth_k", "seg")
        .agg(count(lit(1)).as("n"))
        .agg(pairSum.as("covered")).withColumn("scheme", lit("b2"))
      val covBoth = c.groupBy("nat", "truth_k", "b1", "seg")
        .agg(count(lit(1)).as("n"))
        .agg(pairSum.as("cov_both"))
      val covU = cov1.select(col("covered").as("v1"))
        .crossJoin(broadcast(cov2.select(col("covered").as("v2"))))
        .crossJoin(broadcast(covBoth))
        .select((col("v1") + col("v2") - col("cov_both")).as("covered"))
        .withColumn("scheme", lit("union"))
      cand1.unionByName(cand2).unionByName(candU)
        .join(cov1.unionByName(cov2).unionByName(covU), "scheme")
        .crossJoin(broadcast(n))
        .crossJoin(broadcast(truth))
        .select(col("scheme"),
          col("cand").as("n_comparisons"),
          // ppm numerators go through DECIMAL(38,0): all_pairs ~ n²/2
          // overflows BIGINT×1e6 past ~4.3M entities (Spark would wrap
          // silently where DuckDB errors); the 128-bit intermediate is
          // exact and `div` still returns BIGINT in both engines.
          expr("""(CAST(all_pairs - cand AS DECIMAL(38,0)) * 1000000)
                  div all_pairs""").as("reduction_ppm"),
          col("true_pairs"),
          col("covered").as("true_covered"),
          expr("""(CAST(covered AS DECIMAL(38,0)) * 1000000)
                  div greatest(1, true_pairs)""")
            .as("completeness_ppm"))
        .orderBy("scheme")
    }))

  // ---- oracles ---------------------------------------------------------

  private def signsSql(j: Int): String =
    planeSigns(j).map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]::DOUBLE[]")

  val oracle: Map[String, String] = Map(
    "q385_zorder_layout" -> {
      // same arithmetic text, DuckDB's integer-division spelling
      val z = zExpr("a", "b").replace(" div ", " // ")
      s"""WITH base AS (
           SELECT l_partkey % 256 AS a, l_suppkey % 256 AS b, l_orderkey
           FROM lineitem),
         tagged AS (
           SELECT 'zorder' AS layout, ($z) // 256 AS file, a, b FROM base
           UNION ALL
           SELECT 'lex', a, a, b FROM base
           UNION ALL
           SELECT 'roundrobin', l_orderkey % 256, a, b FROM base),
         files AS (
           SELECT layout, file, count(*) AS n_rows,
             min(a) AS min_a, max(a) AS max_a,
             min(b) AS min_b, max(b) AS max_b
           FROM tagged GROUP BY 1, 2),
         matched AS (
           SELECT count(*) AS rows_matched FROM base
           WHERE a BETWEEN 64 AND 127 AND b BETWEEN 2 AND 5)
         SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN max_a >= 64 AND min_a <= 127
                     AND max_b >= 2 AND min_b <= 5
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(sum(CASE WHEN max_a >= 64 AND min_a <= 127
                     AND max_b >= 2 AND min_b <= 5
                THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(max(rows_matched) AS BIGINT) AS rows_matched,
           CAST(sum(CASE WHEN max_a >= 64 AND min_a <= 127
                     AND max_b >= 2 AND min_b <= 5
                THEN n_rows ELSE 0 END) * 1000000
             // greatest(1, max(rows_matched)) AS BIGINT)
             AS scan_amplification_ppm
         FROM files CROSS JOIN matched
         GROUP BY layout
         ORDER BY layout"""
    },

    "q386_knn_label_audit" -> {
      val projCols = (0 until NPlanes).map { j =>
        s"round(list_dot_product(CAST(embedding AS DOUBLE[]), " +
          s"${signsSql(j)}), 6) AS p$j"
      }.mkString(", ")
      val bucketTerms = (0 until NPlanes).map { j =>
        s"CASE WHEN $j < bits AND p$j >= 0 THEN ${1 << j} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH nb AS (
           SELECT greatest(4,
             length(format('{:b}', (count(*) - 1) // 125))) AS bits
           FROM embeddings),
         pr AS (
           SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             $projCols
           FROM embeddings),
         bk AS (
           SELECT vec_id, label, v, ($bucketTerms) AS bucket
           FROM pr CROSS JOIN nb),
         pairs AS (
           SELECT x.vec_id AS a_id, x.label AS a_label,
             y.vec_id AS b_id, y.label AS b_label,
             round(list_cosine_similarity(x.v, y.v), 6) AS cos_r
           FROM bk x JOIN bk y
             ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         top5 AS (
           SELECT * FROM (
             SELECT p.*, row_number() OVER (
               PARTITION BY a_id ORDER BY cos_r DESC, b_id) AS rk
             FROM pairs p)
           WHERE rk <= 5),
         full5 AS (
           SELECT a_id FROM top5 GROUP BY a_id HAVING count(*) = 5),
         votes AS (
           SELECT t.a_id, t.a_label, t.b_label, count(*) AS c
           FROM top5 t JOIN full5 f USING (a_id)
           GROUP BY 1, 2, 3),
         maj AS (
           SELECT a_id, a_label, b_label AS maj_label, c AS maj_c
           FROM (SELECT v.*, row_number() OVER (
                   PARTITION BY a_id ORDER BY c DESC, b_label) AS rk
                 FROM votes v)
           WHERE rk = 1)
         SELECT CAST(a_label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_anchors,
           CAST(sum(CASE WHEN maj_label <> a_label AND maj_c >= 3
                THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
           CAST(sum(CASE WHEN maj_label <> a_label AND maj_c >= 3
                THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
             AS suspect_ppm
         FROM maj
         GROUP BY 1 ORDER BY 1"""
    },

    "q387_blocking_quality" ->
      """WITH c AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         k AS (
           SELECT nat, seg, cents // 1000 AS truth_k, cents // 3000 AS b1
           FROM c),
         allp AS (
           SELECT count(*) * (count(*) - 1) // 2 AS all_pairs FROM k),
         cand1 AS (
           SELECT sum(n * (n - 1) // 2) AS cand
           FROM (SELECT count(*) AS n FROM k GROUP BY b1)),
         cand2 AS (
           SELECT sum(n * (n - 1) // 2) AS cand
           FROM (SELECT count(*) AS n FROM k GROUP BY nat, seg)),
         candb AS (
           SELECT sum(n * (n - 1) // 2) AS cand
           FROM (SELECT count(*) AS n FROM k GROUP BY b1, nat, seg)),
         truth AS (
           SELECT sum(n * (n - 1) // 2) AS true_pairs
           FROM (SELECT count(*) AS n FROM k GROUP BY nat, truth_k)),
         cov1 AS (
           SELECT sum(n * (n - 1) // 2) AS covered
           FROM (SELECT count(*) AS n FROM k GROUP BY nat, truth_k, b1)),
         cov2 AS (
           SELECT sum(n * (n - 1) // 2) AS covered
           FROM (SELECT count(*) AS n FROM k
                 GROUP BY nat, truth_k, seg)),
         covb AS (
           SELECT sum(n * (n - 1) // 2) AS covered
           FROM (SELECT count(*) AS n FROM k
                 GROUP BY nat, truth_k, b1, seg)),
         schemes AS (
           SELECT 'b1' AS scheme, (SELECT cand FROM cand1) AS cand,
             (SELECT covered FROM cov1) AS covered
           UNION ALL
           SELECT 'b2', (SELECT cand FROM cand2),
             (SELECT covered FROM cov2)
           UNION ALL
           SELECT 'union',
             (SELECT cand FROM cand1) + (SELECT cand FROM cand2)
               - (SELECT cand FROM candb),
             (SELECT covered FROM cov1) + (SELECT covered FROM cov2)
               - (SELECT covered FROM covb))
         SELECT scheme, CAST(cand AS BIGINT) AS n_comparisons,
           CAST(CAST(all_pairs - cand AS HUGEINT) * 1000000
             // all_pairs AS BIGINT) AS reduction_ppm,
           CAST(true_pairs AS BIGINT) AS true_pairs,
           CAST(covered AS BIGINT) AS true_covered,
           CAST(CAST(covered AS HUGEINT) * 1000000
             // greatest(1, true_pairs) AS BIGINT)
             AS completeness_ppm
         FROM schemes CROSS JOIN allp CROSS JOIN truth
         ORDER BY scheme""")
}
