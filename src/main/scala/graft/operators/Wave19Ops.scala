package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 19: graph feature engineering, training-pair mining,
  * end-to-end entity resolution, and LSH calibration.
  *
  *   - q215 2-hop neighbor feature aggregation (the GraphSAGE-style
  *     message-passing primitive): floor-mean of neighbor features,
  *     then floor-mean of THOSE over the second hop — all exact
  *     integer arithmetic via a non-negativity shift.
  *   - q216 deterministic negative-edge sampling for link-prediction /
  *     contrastive training: per-node hash-generated candidates minus
  *     the real edge set.
  *   - q217 entity resolution end-to-end: FastSS edit-distance-1
  *     blocking → exact verify → connected components → golden-record
  *     merge, on (supplier name, nation) composite records.
  *   - q218 empirical LSH S-curve: banded-MinHash detection rate by
  *     exact-Jaccard decile over a hash-sampled doc subset — the
  *     calibration evidence for choosing band/row counts before
  *     trusting the q37 banding at corpus scale.
  */
object Wave19Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Distinct customer→supplier trade edges (the q119/q187 graph). */
  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem")
      .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()

  /** Shift making balance-cents non-negative before integer division,
    * so `div` (truncation) == floor division on BOTH engines whatever
    * the sign of the sum: (Σc + n·K) div n − K = floor(Σc / n) for
    * Σc ≥ −n·K. acctbal ≥ −999.99 ⇒ cents ≥ −99_999 > −K. */
  private val Shift = 100000L

  val queries: Map[String, Q] = Map(
    // ---- q215: 2-hop neighbor feature aggregation ----------------------
    // The message-passing step a GNN feature pipeline runs at corpus
    // scale: hop 1 aggregates each customer's neighbor-supplier balance
    // (floor-mean, exact integers); hop 2 aggregates those customer
    // summaries back onto each supplier. Two equi-joins on the edge
    // list, each followed by a map-side-combined aggregation on the
    // destination key — the same bounded-rounds shape as PageRank
    // (q119) and BFS (q187), but carrying a FEATURE, not a rank. The
    // floor-mean rides the non-negativity shift so Spark's truncating
    // `div` and DuckDB's `//` agree on negative balances.
    "q215_gnn_2hop" -> ((s, d) => {
      val edges = tradeEdges(s, d)
      val feat = table(s, d, "supplier")
        .select(col("s_suppkey").as("supp"),
          expr("CAST(floor(s_acctbal * 100) AS BIGINT)").as("cents"))
      val h1 = edges.join(feat, "supp")
        .groupBy("cust")
        .agg(sum("cents").as("ssum"), count(lit(1)).as("n1"))
        .select(col("cust"),
          (expr(s"(ssum + n1 * ${Shift}L) div n1") - Shift).as("h1"))
      edges.join(h1, "cust")
        .groupBy("supp")
        .agg(sum("h1").as("hsum"), count(lit(1)).as("n2"))
        .select(col("supp"), col("n2"),
          (expr(s"(hsum + n2 * ${Shift}L) div n2") - Shift).as("h2"))
    }),

    // ---- q216: deterministic negative-edge sampling --------------------
    // Five hash-generated candidate suppliers per customer, minus the
    // edges that actually exist — the negative pairs a link-prediction
    // or contrastive objective trains against. The generator is pure
    // map-side codegen (md5 of customer#slot mod |suppliers|, the
    // corpus scalar riding one broadcast); the only shuffle is the
    // LEFT ANTI hash join against the real edge set on (cust, supp) —
    // at 100 TB that is one key-partitioned pass over the edge list,
    // never a per-candidate lookup. Deterministic: same corpus, same
    // negatives, any partitioning.
    "q216_negative_edges" -> ((s, d) => {
      val nSupp = table(s, d, "supplier")
        .agg(count(lit(1)).as("n_supp"))
      val cands = table(s, d, "customer")
        .select(col("c_custkey").as("cust"))
        .crossJoin(broadcast(nSupp))
        .select(col("cust"), explode(sequence(lit(0), lit(4))).as("slot"),
          col("n_supp"))
        .withColumn("cand",
          conv(substring(md5(concat(col("cust").cast("string"), lit("#"),
            col("slot").cast("string"))), 1, 13), 16, 10).cast("long")
            % col("n_supp") + 1)
      // Raw (cust, supp) pairs, NOT tradeEdges: a LEFT ANTI join is
      // insensitive to right-side duplicates, so the whole-corpus
      // DISTINCT exchange tradeEdges pays is pure overhead here (guide
      // §2.4: remove shuffles outright). Result identical — NOT EXISTS
      // semantics either way.
      val edges = table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      cands.join(edges,
          cands("cust") === edges("cust") && cands("cand") === edges("supp"),
          "left_anti")
        .select(col("cust"), col("slot").cast("long").as("slot"), col("cand"))
    }),

    // ---- q217: entity resolution end-to-end ----------------------------
    // The full ER pipeline a record-linkage job runs: candidate pairs
    // from FastSS deletion-neighborhood blocking on the composite
    // (name, nation) record (q175's discipline — O(len) variants per
    // record, equi-join on the variant, exact levenshtein only on
    // candidates), transitive closure via hash-min connected
    // components (entity id = min member key), then the golden-record
    // merge per entity. The nation suffix is the blocking field:
    // cross-nation near-misses stay separate entities, exactly as a
    // production linkage keys its blocks. CC runs to convergence
    // (chains of distance-1 names can be long); every stage's shuffle
    // keys on the variant / node / entity — never all-pairs.
    "q217_entity_resolution" -> ((s, d) => {
      val recs = table(s, d, "supplier")
        .join(table(s, d, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("id"),
          concat(lower(col("s_name")), lit(" "), lower(col("n_name")))
            .as("nm"),
          expr("CAST(floor(s_acctbal * 100) AS BIGINT)").as("cents"))
      // The variant exchange carries IDS ONLY (r12, guide §2.3: shuffle
      // keys and metadata, not payloads): the join key is the 8-byte
      // xxhash64 of the variant string and the record's name does NOT
      // ride the explode — names are re-attached at the PAIR grain (a
      // per-id broadcast lookup against the tiny distinct-pair set)
      // before the exact levenshtein verify. Result-identical by the
      // FastSS completeness argument: lev(a,b) <= 1 implies a shared
      // TRUE variant (equal -> nm itself, which array_union keeps;
      // deletion -> the shorter IS a deletion variant of the longer and
      // its own nm; substitution -> deleting the substituted position
      // from both sides yields the same string), so hashing the variant
      // can only ADD candidates (64-bit collisions), never lose one —
      // and every candidate, exact or collided, passes the same
      // levenshtein <= 1 verify that defined the old pair set. At
      // corpus scale this halves-plus the variant exchange bytes (two
      // ~30-char strings per row -> 8+8 bytes) and moves the distinct
      // onto a (long, long) pair key.
      val variants = recs.select(col("id"), explode(expr(
        """array_union(array(nm), transform(sequence(1, length(nm)),
           i -> concat(substring(nm, 1, i - 1),
                       substring(nm, i + 1, length(nm) - i))))"""
        )).as("variant"))
        .select(col("id"), xxhash64(col("variant")).as("vh"))
      val a = variants.select(col("vh"), col("id").as("a_id"))
      val b = variants.select(col("vh"), col("id").as("b_id"))
      val names = recs.select(col("id"), col("nm"))
      val pairs = a.join(b, "vh").filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
        .join(broadcast(names.select(col("id").as("a_id"),
          col("nm").as("a_nm"))), "a_id")
        .join(broadcast(names.select(col("id").as("b_id"),
          col("nm").as("b_nm"))), "b_id")
        .filter(levenshtein(col("a_nm"), col("b_nm")) <= 1)
        .select("a_id", "b_id")
      val comp = GraphOps.connectedComponents(pairs)
        .withColumnRenamed("id", "mid")
      recs.join(comp, recs("id") === col("mid"), "left_outer")
        .select(col("id"), col("nm"), col("cents"),
          coalesce(col("comp"), col("id")).as("entity"))
        .groupBy("entity")
        .agg(count(lit(1)).as("n_members"), min("nm").as("canonical"),
          max("cents").as("max_cents"), sum("cents").as("total_cents"))
    }),

    // ---- q218: empirical LSH S-curve (banding calibration) -------------
    // Measure the 2-band/2-row MinHash banding's detection probability
    // as a function of TRUE Jaccard, the way a dedup deployment
    // calibrates b/r before trusting q37's candidates at corpus scale:
    // each doc in a fixed hash sample (doc_id % 5 — the calibration
    // budget, constant per corpus) is paired with NINE controlled
    // degradations of itself (perturbation strength k/10 replaces each
    // token deterministically by hash, so the pair's exact shingle
    // Jaccard sweeps the whole [0,1] range — the corpus's organic pairs
    // alone are bimodal: exact dups or nothing). Exact Jaccard, both
    // signatures, and band agreement are all computed PER ROW with
    // array lambdas — zero shuffle before the final |deciles|-row
    // rollup, and the whole audit costs sample_size × 9 map-side rows
    // at any corpus size. detect_ppm by decile IS the empirical
    // S-curve; BandingSpec in Wave19Spec checks it is monotone and
    // pins the analytic 1-(1-s²)² curve within sampling error.
    "q218_lsh_scurve" -> ((s, d) => {
      // Two per-row kernel cuts, output byte-identical (guide §1.2
      // step 2):
      //  1. The UNPERTURBED side's whole pipeline — shingle set, its
      //     md5 array, and the 4 signature mins — is a function of the
      //     doc alone, so it is computed ONCE PER DOC above the 9-way
      //     k-explode instead of once per (doc, k) row (9× cut on half
      //     the kernel).
      //  2. md5 runs ONCE per shingle per side; the per-offset
      //     signature mins are cheap substring folds over the hash
      //     array (the former shape recomputed the digests for every
      //     one of the 8 signature expressions). CollapseProject keeps
      //     the hoisted arrays materialized: an alias consumed by
      //     multiple non-cheap expressions is not inlined.
      def shingleSet(c: String) = expr(
        s"""array_distinct(transform(sequence(0, size($c) - 3),
            i -> concat_ws(' ', slice($c, i + 1, 3))))""")
      def sig(c: String, off: Int) = expr(
        s"array_min(transform($c, h -> substring(h, $off, 8)))")
      val docs = table(s, d, "documents")
        .select(col("doc_id"),
          filter(split(lower(col("text")), " "), w => length(w) > 0)
            .as("t"))
        .filter(col("doc_id") % 5 === 0 && size(col("t")) >= 20)
        .withColumn("sa", shingleSet("t"))
        .withColumn("ha", expr("transform(sa, x -> md5(x))"))
        .select(col("doc_id"), col("t"), col("sa"),
          sig("ha", 1).as("a1"), sig("ha", 9).as("a9"),
          sig("ha", 17).as("a17"), sig("ha", 25).as("a25"),
          explode(sequence(lit(1), lit(9))).as("k"))
      // i sweeps explicit 0-based positions so the Spark and DuckDB
      // lambdas agree exactly; the salted '?' prefix can never collide
      // with a real token.
      val perturbed = docs.withColumn("tv", expr(
        """transform(sequence(0, size(t) - 1),
             i -> CASE WHEN CAST(conv(substring(md5(concat(
                         CAST(doc_id AS STRING), ':', CAST(i AS STRING),
                         ':', CAST(k AS STRING))), 1, 4), 16, 10)
                         AS BIGINT) % 10 < k
                       THEN concat('?', element_at(t, i + 1))
                       ELSE element_at(t, i + 1) END)"""))
      val scored = perturbed
        .withColumn("sv", shingleSet("tv"))
        .withColumn("inter",
          size(array_intersect(col("sa"), col("sv"))).cast("long"))
        .withColumn("uni",
          (size(col("sa")) + size(col("sv"))).cast("long") - col("inter"))
        .withColumn("hv", expr("transform(sv, x -> md5(x))"))
        .select(
          least(lit(9L), expr("(inter * 10) div uni")).as("decile"),
          when((col("a1") === sig("hv", 1) &&
            col("a9") === sig("hv", 9)) ||
            (col("a17") === sig("hv", 17) &&
              col("a25") === sig("hv", 25)), 1L).otherwise(0L)
            .as("detected"))
      scored.groupBy("decile")
        .agg(count(lit(1)).as("n_pairs"), sum("detected").as("n_detected"))
        .withColumn("detect_ppm",
          expr("n_detected * 1000000 div n_pairs"))
    }))

  val oracle: Map[String, String] = Map(
    "q215_gnn_2hop" ->
      """WITH edges AS (
           SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         feat AS (
           SELECT s_suppkey AS supp,
                  CAST(floor(s_acctbal * 100) AS BIGINT) AS cents
           FROM supplier),
         h1 AS (
           SELECT cust,
                  (sum(cents) + count(*) * 100000) // count(*) - 100000
                    AS h1
           FROM edges JOIN feat USING (supp) GROUP BY cust)
         SELECT supp, CAST(count(*) AS BIGINT) AS n2,
                CAST((sum(h1) + count(*) * 100000) // count(*) - 100000
                  AS BIGINT) AS h2
         FROM edges JOIN h1 USING (cust) GROUP BY supp""",
    "q216_negative_edges" ->
      """WITH ns AS (SELECT count(*) AS n_supp FROM supplier),
         cands AS (
           SELECT c_custkey AS cust, slot,
                  CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                    || '#' || CAST(slot AS VARCHAR)), 1, 13)) AS BIGINT)
                    % n_supp + 1 AS cand
           FROM customer, ns,
                (SELECT unnest(range(5)) AS slot)),
         edges AS (
           SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         SELECT cust, CAST(slot AS BIGINT) AS slot, cand
         FROM cands
         WHERE NOT EXISTS (SELECT 1 FROM edges e
                           WHERE e.cust = cands.cust
                             AND e.supp = cands.cand)""",
    "q217_entity_resolution" ->
      """WITH RECURSIVE recs AS (
           SELECT s_suppkey AS id,
                  lower(s_name) || ' ' || lower(n_name) AS nm,
                  CAST(floor(s_acctbal * 100) AS BIGINT) AS cents
           FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         pairs AS (
           SELECT a.id AS a_id, b.id AS b_id
           FROM recs a JOIN recs b
             ON a.id < b.id AND levenshtein(a.nm, b.nm) <= 1),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(a, b) AS (
           SELECT id, id FROM recs
           UNION
           SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         comp AS (SELECT a AS id, min(b) AS entity FROM reach GROUP BY a)
         SELECT entity, CAST(count(*) AS BIGINT) AS n_members,
                min(nm) AS canonical,
                CAST(max(cents) AS BIGINT) AS max_cents,
                CAST(sum(cents) AS BIGINT) AS total_cents
         FROM comp JOIN recs USING (id) GROUP BY entity""",
    "q218_lsh_scurve" ->
      """WITH docs AS (
           SELECT doc_id,
                  list_filter(string_split(lower(text), ' '), w -> w <> '')
                    AS t
           FROM documents WHERE doc_id % 5 = 0),
         d2 AS (
           SELECT doc_id, t, k
           FROM docs, (SELECT unnest(range(1, 10)) AS k)
           WHERE len(t) >= 20),
         pert AS (
           SELECT doc_id, k, t,
                  list_transform(range(0, len(t)),
                    i -> CASE WHEN CAST(('0x' || substr(md5(
                                CAST(doc_id AS VARCHAR) || ':' ||
                                CAST(i AS VARCHAR) || ':' ||
                                CAST(k AS VARCHAR)), 1, 4)) AS BIGINT)
                                % 10 < k
                              THEN '?' || t[i + 1] ELSE t[i + 1] END)
                    AS tv
           FROM d2),
         sets AS (
           SELECT doc_id, k,
                  list_distinct(list_transform(range(0, len(t) - 2),
                    i -> array_to_string(t[i + 1 : i + 3], ' '))) AS sa,
                  list_distinct(list_transform(range(0, len(tv) - 2),
                    i -> array_to_string(tv[i + 1 : i + 3], ' '))) AS sv
           FROM pert),
         scored AS (
           SELECT least(9, (CAST(len(list_intersect(sa, sv)) AS BIGINT)
                            * 10)
                    // (len(sa) + len(sv)
                        - len(list_intersect(sa, sv)))) AS decile,
                  CASE WHEN
                    (list_min(list_transform(sa,
                        x -> substr(md5(x), 1, 8))) =
                     list_min(list_transform(sv,
                        x -> substr(md5(x), 1, 8)))
                     AND
                     list_min(list_transform(sa,
                        x -> substr(md5(x), 9, 8))) =
                     list_min(list_transform(sv,
                        x -> substr(md5(x), 9, 8))))
                    OR
                    (list_min(list_transform(sa,
                        x -> substr(md5(x), 17, 8))) =
                     list_min(list_transform(sv,
                        x -> substr(md5(x), 17, 8)))
                     AND
                     list_min(list_transform(sa,
                        x -> substr(md5(x), 25, 8))) =
                     list_min(list_transform(sv,
                        x -> substr(md5(x), 25, 8))))
                    THEN 1 ELSE 0 END AS detected
           FROM sets)
         SELECT CAST(decile AS BIGINT) AS decile,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(detected) AS BIGINT) AS n_detected,
                CAST(sum(detected) * 1000000 // count(*) AS BIGINT)
                  AS detect_ppm
         FROM scored GROUP BY decile""")
}
