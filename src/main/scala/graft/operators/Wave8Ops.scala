package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-4 wave 8: sketch set algebra and URL-level dedup — two corpus
  * governance shapes a 100 TB ingestion pipeline runs before any
  * content-level pass:
  *
  *   - KMV sketch set operations (q165): per-source distinct-shingle
  *     sketches (k minimum hash values each) combined pairwise into
  *     union / intersection / Jaccard ESTIMATES (Bar-Yossef et al. 2002;
  *     Beyer et al., SIGMOD 2007). The exact pairwise overlap audit
  *     (q131) shuffles per-source-distinct posting lists — fine when
  *     sources fit; the sketch version answers the same "how much of
  *     dump B is already in dump A" question shipping AT MOST k longs
  *     per source, so 1000 dumps cost 1000·k longs of reducer input
  *     regardless of corpus size. Estimates are carried in pure integer
  *     arithmetic ((m−1)·2^52 div u_m, ppm ratios) so both engines
  *     agree bit-for-bit.
  *
  *   - URL canonicalization + dedup (q170): the RefinedWeb/CCNet
  *     URL-level dedup pass — lowercase scheme+host, strip default
  *     ports, drop tracking params (utm_*, fbclid) and fragments, trim
  *     trailing slashes, then keep one row per canonical URL. Pure
  *     map-side regexp canonicalization feeding one groupBy — the
  *     cheapest dedup gate there is, run before any text is even read.
  *     (Reference context: the reference stores raw `url` and derives
  *     host/curid with string ops — extract_references.py; this is the
  *     corpus-scale generalization of that normalization step.)
  */
object Wave8Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Tokenize into non-empty lowercase word array (TextOps contract). */
  private def words(c: Column): Column =
    filter(split(lower(c), " "), w => w =!= "")

  /** Sketch size: estimates are ±~1/√k; 64 matches q60's KMV. */
  private val K = 64

  /** Span length for the exact-substring dedup pass (q172). */
  private val SpanLen = 5

  val queries: Map[String, Q] = Map(
    // ---- q165: KMV sketch set algebra across sources -------------------
    // Per-source sketch = the K smallest 52-bit md5 hashes of the
    // source's distinct 3-token shingles (bounded KmvMinK aggregator:
    // map-side combined, ≤K longs of state per group). Pairwise:
    //   merged  = min-K of the two sketches' union (dedup'd)
    //   m_u     = |merged|  (< K only when both sets are tiny)
    //   u_m     = merged[m_u]           (the m_u-th order statistic)
    //   union_est   = (m_u−1)·2^52 div u_m
    //   rho     = |{x ∈ merged : x ∈ A ∧ x ∈ B}|
    //   jaccard_ppm = rho·1e6 div m_u
    //   inter_est   = rho·union_est div m_u
    // All integer ops over exact hash values — engine-portable with no
    // float division. The pair frame is |sources|² sketch rows (tiny at
    // any corpus scale), so the non-equi `<` pairing is a bounded
    // build, never a corpus-sized nested loop.
    "q165_kmv_set_ops" -> ((s, d) => {
      val sh = table(s, d, "documents")
        .withColumn("tokens", words(col("text")))
        .filter(size(col("tokens")) >= 3)
        .select(col("source"), explode(expr(
          """transform(sequence(0, size(tokens) - 3),
             i -> concat_ws(' ', slice(tokens, i + 1, 3)))""")).as("shingle"))
      val hv = conv(substring(md5(col("shingle")), 1, 13), 16, 10)
        .cast("long")
      val kmv = udaf(new graft.functions.KmvMinK(K))
      val sk = sh.select(col("source"), hv.as("hv"))
        .groupBy("source").agg(kmv(col("hv")).as("arr"))
      val a = sk.select(col("source").as("src_a"), col("arr").as("a_arr"))
      val b = sk.select(col("source").as("src_b"), col("arr").as("b_arr"))
      a.join(b, col("src_a") < col("src_b"))
        .withColumn("merged",
          slice(array_sort(array_union(col("a_arr"), col("b_arr"))), 1, K))
        .withColumn("m_u", size(col("merged")).cast("long"))
        .withColumn("u_m", element_at(col("merged"), col("m_u").cast("int")))
        .withColumn("union_est",
          expr("(m_u - 1) * CAST(4503599627370496 AS BIGINT) div u_m"))
        .withColumn("rho",
          size(array_intersect(array_intersect(col("merged"), col("a_arr")),
            col("b_arr"))).cast("long"))
        .select(col("src_a"), col("src_b"), col("union_est"),
          expr("rho * union_est div m_u").as("inter_est"),
          expr("rho * 1000000 div m_u").as("jaccard_ppm"))
    }),

    // ---- q170: URL canonicalization + dedup ----------------------------
    // Synthetic raw URLs (4 deterministic variants per item id: host
    // case, default port + utm tracking param, trailing slash +
    // fragment) canonicalized with the standard pass and deduped on
    // the canonical form. Everything up to the final groupBy is
    // codegen'd per-row string work; the groupBy on the canonical URL
    // is the only shuffle, map-side combined.
    "q170_url_dedup" -> ((s, d) => {
      val raw = table(s, d, "orders")
        .withColumn("item", expr("o_orderkey div 4"))
        .withColumn("v", expr("o_orderkey % 4"))
        .withColumn("url",
          when(col("v") === 0,
            concat(lit("https://shop.example.com/item/"), col("item")))
          .when(col("v") === 1,
            concat(lit("HTTPS://SHOP.Example.COM/item/"), col("item")))
          .when(col("v") === 2,
            concat(lit("https://shop.example.com:443/item/"), col("item"),
              lit("?utm_source=feed&utm_campaign=x")))
          .otherwise(
            concat(lit("https://shop.example.com/item/"), col("item"),
              lit("/#ref"))))
      // canonicalization: drop fragment -> drop tracking params (fix
      // dangling ?/&) -> lowercase scheme+host, strip default port ->
      // trim trailing slash on a non-root path
      val noFrag = regexp_replace(col("url"), "#.*$", "")
      val noTrack = regexp_replace(
        regexp_replace(noFrag, "(utm_[a-z]+|fbclid)=[^&#]*&?", ""),
        "[?&]$", "")
      val host = lower(regexp_extract(noTrack, "^[a-zA-Z]+://([^/:?#]+)", 1))
      val port = regexp_extract(noTrack, "^[a-zA-Z]+://[^/:?#]+:([0-9]+)", 1)
      val rest = regexp_extract(noTrack, "^[a-zA-Z]+://[^/?#]+(.*)$", 1)
      val canon = concat(lit("https://"), host,
        when(port === "" || port === "443" || port === "80", lit(""))
          .otherwise(concat(lit(":"), port)),
        regexp_replace(rest, "/(?=$|\\?)", ""))
      raw.select(canon.as("canon_url"), col("o_orderkey"))
        .groupBy("canon_url")
        .agg(count(lit(1)).as("n_raw"), min("o_orderkey").as("keeper"))
    }),

    // ---- q172: exact-substring dedup APPLY (Lee et al. 2022) -----------
    // "Deduplicating Training Data Makes Language Models Better": q100
    // FINDS cross-document duplicated 5-token spans; this op REMOVES
    // them — every token position covered by any span that also occurs
    // in another document is cut, and the surviving tokens are
    // reassembled in order into the cleaned text. Scale shape: one
    // shuffle on the span key to find duplicated spans (map-side
    // combined count-distinct), the covered-position set is bounded by
    // actually-duplicated spans (not the corpus), and reassembly is one
    // per-doc aggregation. Nothing is ever all-pairs; the reference
    // suffix-array formulation is a single-node algorithm — this is
    // its shuffle-native equivalent.
    "q172_exactsubstr_dedup" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), words(col("text")).as("tokens"))
      val spans = docs.filter(size(col("tokens")) >= SpanLen)
        .select(col("doc_id"), posexplode(expr(
          s"""transform(sequence(0, size(tokens) - $SpanLen),
              i -> concat_ws(' ', slice(tokens, i + 1, $SpanLen)))"""))
          .as(Seq("p", "span")))
      val dup = spans.groupBy("span")
        .agg(countDistinct("doc_id").as("nd")).filter(col("nd") >= 2)
        .select("span")
      val covered = spans.join(dup, Seq("span"), "left_semi")
        .select(col("doc_id"),
          explode(sequence(col("p"), col("p") + (SpanLen - 1))).as("pos"))
        .distinct()
      val toks = docs.select(col("doc_id"),
        posexplode(col("tokens")).as(Seq("pos", "tok")))
      val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
        .groupBy("doc_id")
        .agg(collect_list(struct(col("pos"), col("tok"))).as("pt"),
          count(lit(1)).as("n_kept"))
        .select(col("doc_id"),
          expr("concat_ws(' ', transform(array_sort(pt), x -> x.tok))")
            .as("clean_text"),
          col("n_kept"))
      docs.select(col("doc_id"), size(col("tokens")).cast("long").as("n_toks"))
        .join(kept, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
    }),

    // ---- q175: fuzzy join (edit distance ≤ 1) via deletion variants ----
    // FastSS (Bocek et al. 2007): two strings with ed ≤ 1 must share a
    // member of each other's deletion neighborhood {s} ∪ {s minus one
    // char}, so the candidate stage is an EQUI-join on the variant key
    // — O(len) variants per string, bucket sizes bounded by how many
    // strings are genuinely one edit apart (never all-pairs). Exact
    // levenshtein runs only on candidates (deletion collisions at
    // different positions can be ed 2 — e.g. "ab"/"ba" share "a" — so
    // the verify step is required, same candidates-then-verify
    // discipline as q84). The id%10 subset stands in for the "suspect
    // slice" a production fuzzy-dedup pass would feed it.
    "q175_fuzzy_join" -> ((s, d) => {
      val c = table(s, d, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey").as("id"), lower(col("c_name")).as("nm"))
      val variants = c.select(col("id"), col("nm"), explode(expr(
        """array_union(array(nm), transform(sequence(1, length(nm)),
           i -> concat(substring(nm, 1, i - 1),
                       substring(nm, i + 1, length(nm) - i))))"""
        )).as("variant"))
      val a = variants.select(col("variant"), col("id").as("a_id"),
        col("nm").as("a_nm"))
      val b = variants.select(col("variant"), col("id").as("b_id"),
        col("nm").as("b_nm"))
      a.join(b, "variant").filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id", "a_nm", "b_nm").distinct()
        .filter(levenshtein(col("a_nm"), col("b_nm")) <= 1)
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_nm"), col("b_nm")).as("dist"))
    }),

    // ---- q176: per-group trend slope, integer-exact ---------------------
    // Least-squares slope of daily revenue per event type — the drift /
    // trend monitor over any keyed daily series. Emitted as the exact
    // integer numerator and denominator (n·Σxy − Σx·Σy, n·Σx² − (Σx)²)
    // rather than a float slope: sums of integer cents and epoch-days
    // are order-independent and engine-exact, so the driver hash-match
    // proves the regression itself, not a rounding of it. Two shuffles
    // (day rollup, then type rollup), both map-side combined; every
    // magnitude is bounded by date-range·cents, well inside BIGINT.
    "q176_trend_slope" -> ((s, d) => {
      val daily = table(s, d, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      daily.groupBy("event_type").agg(
          count(lit(1)).as("n_days"),
          sum(expr("day * y")).as("sxy"),
          sum("day").as("sx"),
          sum("y").as("sy"),
          sum(expr("day * day")).as("sxx"))
        .select(col("event_type"), col("n_days"),
          expr("n_days * sxy - sx * sy").as("slope_num"),
          expr("n_days * sxx - sx * sx").as("slope_den"))
    }),

    // ---- q177: sweep-line peak concurrency -----------------------------
    // Maximum simultaneous open intervals per day (each event held open
    // 600 s) — the classic sweep line: +1/−1 boundary points, running
    // sum over the GLOBAL time order, max per day. The global running
    // sum is the distributed two-phase prefix sum (range partition →
    // partition-local window → broadcast per-partition offsets), so no
    // single-partition window ever sees the corpus — the same
    // machinery as q93/q113/q116. Ends sort before starts at the same
    // second (delta −1 < +1), giving half-open [s, e) semantics.
    "q177_concurrency" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_id").as("eid"),
          expr("ts div 1000000000").as("sec"))
      val pts = ev.select(col("sec").as("t"), lit(1L).as("delta"), col("eid"))
        .unionByName(ev.select((col("sec") + 600).as("t"),
          lit(-1L).as("delta"), col("eid")))
      TextOps.orderedCumsum(pts, Seq("t", "delta", "eid"), "delta", "conc")
        .groupBy(expr("t div 86400").as("day"))
        .agg(max("conc").as("peak"), count(lit(1)).as("n_points"))
    }),

    // ---- q178: bitmap index build + bitwise predicate algebra ----------
    // Per-63-doc-block presence bitmaps for two predicates (lang = 'en';
    // n_chars ≥ 300), built with bit_or(1 << doc_id%64) — one map-side-
    // combined shuffle each, 1 long per block of 63 docs (bit 63 stays clear so the words are non-negative in engines that check signed shifts). Conjunction /
    // disjunction counts then cost popcount(a & b) on the block frame —
    // the bitmap-index trick serving layers use to answer multi-
    // predicate counts without rescanning: at 100 TB the bitmaps are
    // ~1/63rd the size of a doc-id list and AND/OR/NOT are word ops.
    "q178_bitmap_index" -> ((s, d) => {
      val docs = table(s, d, "documents")
      def bitmap(pred: Column, name: String) = docs.filter(pred)
        .select(expr("doc_id div 63").as("block"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 63 AS INT))")
            .as("bit"))
        .groupBy("block").agg(expr("bit_or(bit)").as(name))
      bitmap(col("lang") === "en", "w_en")
        .join(bitmap(col("n_chars") >= 300, "w_long"), Seq("block"),
          "full_outer")
        .select(col("block"),
          coalesce(col("w_en"), lit(0L)).as("w_en"),
          coalesce(col("w_long"), lit(0L)).as("w_long"))
        .withColumn("n_en", expr("bit_count(w_en)").cast("long"))
        .withColumn("n_and", expr("bit_count(w_en & w_long)").cast("long"))
        .withColumn("n_or", expr("bit_count(w_en | w_long)").cast("long"))
    }),

    // ---- q179: inverted-index build ------------------------------------
    // The retrieval-index build shape: per-term segment statistics (df,
    // cf, doc-id bounds) plus an ORDER-INDEPENDENT posting checksum —
    // bit_xor of a 52-bit hash of every (doc, pos, term) posting. The
    // checksum replaces collect_list-and-sort (which would materialize
    // a stopword's full posting list in one aggregation buffer): XOR
    // is commutative/associative, so it map-side combines and never
    // holds more than 8 bytes per term, yet any lost/duplicated/moved
    // posting flips it. One shuffle on the term key; a production
    // writer would emit doc-id-sorted posting segments from the same
    // exchange.
    "q179_inverted_index" -> ((s, d) => {
      table(s, d, "documents")
        .select(col("doc_id"), posexplode(words(col("text")))
          .as(Seq("pos", "tok")))
        .withColumn("hv", conv(substring(md5(concat_ws(":",
          col("doc_id"), col("pos"), col("tok"))), 1, 13), 16, 10)
          .cast("long"))
        .groupBy("tok")
        .agg(countDistinct("doc_id").as("df"),
          count(lit(1)).as("cf"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"),
          expr("bit_xor(hv)").as("postings_xor"))
    }),

    // ---- q180: temporal dimension join (as-of on validity versions) ----
    // The SCD2 lookup every fact pipeline needs: each order joined to
    // the rate-card version in force on its order date. Runs through
    // the engine's NATIVE AsOfJoinExec (plans/AsOfJoin.scala) — fact
    // side hash-partitioned on the segment key, dimension side tiny —
    // proving the custom operator composes as a general temporal-join
    // primitive, not just event attribution (q114/q129). The versioned
    // dim is synthesized deterministically (3 versions per segment,
    // md5-derived basis-point rates) so the DuckDB native ASOF JOIN
    // oracle can rebuild it bit-for-bit.
    "q180_temporal_join" -> ((s, d) => {
      val segs = table(s, d, "customer")
        .select(col("c_mktsegment").as("seg")).distinct()
      val rates = segs
        .select(col("seg"), explode(expr("sequence(0, 2)")).as("ver"))
        .withColumn("valid_from",
          expr("make_timestamp_ntz(1995 + ver * 2, 1, 1, 0, 0, 0)"))
        .withColumn("rate_bp",
          conv(substring(md5(concat(col("seg"), col("ver"))), 1, 4), 16, 10)
            .cast("long") % 500 + 100)
      val facts = table(s, d, "orders")
        .join(table(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"),
          col("c_mktsegment").as("seg"))
      graft.plans.AsOf.join(facts, rates, Seq("seg"),
          leftTime = "o_orderdate", rightTime = "valid_from",
          tieBreak = Seq("ver"))
        .groupBy("seg", "ver", "rate_bp")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // ---- q181: exact median via value-domain histogram -----------------
    // Exact (lower) median per group WITHOUT sorting the corpus: one
    // map-side-combined shuffle builds the (group, value) → count
    // histogram, then the running sum and the median pick run over
    // frames bounded by |value domain| (≤50 quantities here), not row
    // count. The standard exact-order-statistic move when the domain
    // is small — at 100 TB the per-group window never sees more rows
    // than distinct values.
    "q181_exact_median" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("q")
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag")
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("n", sum("cnt").over(wAll))
        .filter(col("cum") * 2 >= col("n"))
        .groupBy("l_returnflag")
        .agg(min("q").as("median_lo"), min("n").as("n_rows"))
    }),

    // ---- q173: time-RANGE window frames --------------------------------
    // Trailing-one-hour per-user activity at every event — RANGE frames
    // bound by the ORDER-BY VALUE (sec−3599 .. sec), not a row count:
    // the feature q141's ROWS frames cannot express when event density
    // varies. Peer rows (equal sec) share a frame, so the result is
    // deterministic without a unique tie-break. One user_id shuffle;
    // frame state is O(events in the hour), independent of corpus size.
    "q173_range_frame" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("sec")
        .rangeBetween(-3599L, org.apache.spark.sql.expressions.Window.currentRow)
      table(s, d, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000000").as("sec"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("cents_1h", sum("cents").over(w))
        .select("event_id", "user_id", "sec", "n_1h", "cents_1h")
    }))

  val oracle: Map[String, String] = Map(
    "q165_kmv_set_ops" ->
      s"""WITH toks AS (
           SELECT source,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS tokens
           FROM documents),
         sh AS (
           SELECT DISTINCT source,
             CAST(('0x' || substr(md5(shingle), 1, 13)) AS BIGINT) AS hv
           FROM (
             SELECT source, unnest(list_transform(range(0, len(tokens) - 2),
               i -> array_to_string(list_slice(tokens, i + 1, i + 3), ' '))) AS shingle
             FROM toks WHERE len(tokens) >= 3)),
         rk AS (
           SELECT source, hv,
             row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
           FROM sh),
         sk AS (
           SELECT source, list_sort(list(hv)) AS arr
           FROM rk WHERE rn <= $K GROUP BY source),
         pairs AS (
           SELECT a.source AS src_a, b.source AS src_b,
             a.arr AS a_arr, b.arr AS b_arr,
             list_slice(list_sort(list_distinct(a.arr || b.arr)), 1, $K) AS merged
           FROM sk a JOIN sk b ON a.source < b.source),
         est AS (
           SELECT src_a, src_b,
             len(merged) AS m_u,
             (len(merged) - 1) * 4503599627370496 // merged[len(merged)]
               AS union_est,
             len(list_filter(merged,
               x -> list_contains(a_arr, x) AND list_contains(b_arr, x)))
               AS rho
           FROM pairs)
         SELECT src_a, src_b, union_est,
           rho * union_est // m_u AS inter_est,
           rho * 1000000 // m_u AS jaccard_ppm
         FROM est""",
    "q170_url_dedup" ->
      """WITH raw AS (
           SELECT o_orderkey, o_orderkey // 4 AS item, o_orderkey % 4 AS v
           FROM orders),
         urls AS (
           SELECT o_orderkey,
             CASE v
               WHEN 0 THEN 'https://shop.example.com/item/' || item
               WHEN 1 THEN 'HTTPS://SHOP.Example.COM/item/' || item
               WHEN 2 THEN 'https://shop.example.com:443/item/' || item
                 || '?utm_source=feed&utm_campaign=x'
               ELSE 'https://shop.example.com/item/' || item || '/#ref'
             END AS url
           FROM raw),
         canon AS (
           SELECT o_orderkey,
             'https://' || lower(regexp_extract(clean,
                 '^[a-zA-Z]+://([^/:?#]+)', 1))
               || CASE WHEN port = '' OR port = '443' OR port = '80'
                       THEN '' ELSE ':' || port END
               || regexp_replace(regexp_extract(clean,
                    '^[a-zA-Z]+://[^/?#]+(.*)$', 1), '/(\?|$)', '\1')
               AS canon_url
           FROM (
             SELECT o_orderkey, clean,
               regexp_extract(clean, '^[a-zA-Z]+://[^/:?#]+:([0-9]+)', 1)
                 AS port
             FROM (
               SELECT o_orderkey,
                 regexp_replace(
                   regexp_replace(regexp_replace(url, '#.*$', ''),
                     '(utm_[a-z]+|fbclid)=[^&#]*&?', '', 'g'),
                   '[?&]$', '') AS clean
               FROM urls)))
         SELECT canon_url, count(*) AS n_raw, min(o_orderkey) AS keeper
         FROM canon GROUP BY canon_url""",
    "q172_exactsubstr_dedup" ->
      """WITH docs AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS tokens
           FROM documents),
         spans AS (
           SELECT doc_id, p,
             array_to_string(list_slice(tokens, p + 1, p + 5), ' ') AS span
           FROM (SELECT doc_id, tokens,
                   unnest(range(0, len(tokens) - 4)) AS p
                 FROM docs WHERE len(tokens) >= 5)),
         dup AS (
           SELECT span FROM spans
           GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
         cov AS (
           SELECT DISTINCT doc_id, pos FROM (
             SELECT doc_id, unnest(range(p, p + 5)) AS pos
             FROM spans WHERE span IN (SELECT span FROM dup))),
         tok AS (
           SELECT doc_id, pos, tokens[pos + 1] AS tok FROM (
             SELECT doc_id, tokens, unnest(range(0, len(tokens))) AS pos
             FROM docs)),
         kept AS (
           SELECT t.doc_id, t.pos, t.tok
           FROM tok t
           WHERE NOT EXISTS (SELECT 1 FROM cov c
                             WHERE c.doc_id = t.doc_id AND c.pos = t.pos)),
         agg AS (
           SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           coalesce(a.n_kept, 0) AS n_kept,
           len(d.tokens) - coalesce(a.n_kept, 0) AS n_removed
         FROM docs d LEFT JOIN agg a USING (doc_id)""",
    "q175_fuzzy_join" ->
      """WITH c AS (SELECT c_custkey AS id, lower(c_name) AS nm
                    FROM customer WHERE c_custkey % 10 = 0)
         SELECT a.id AS a_id, b.id AS b_id,
           levenshtein(a.nm, b.nm) AS dist
         FROM c a JOIN c b ON a.id < b.id
         WHERE levenshtein(a.nm, b.nm) <= 1""",
    "q176_trend_slope" ->
      """WITH daily AS (
           SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT event_type,
             count(*) AS n_days,
             CAST(sum(day * y) AS BIGINT) AS sxy,
             CAST(sum(day) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(day * day) AS BIGINT) AS sxx
           FROM daily GROUP BY event_type)
         SELECT event_type, n_days,
           n_days * sxy - sx * sy AS slope_num,
           n_days * sxx - sx * sx AS slope_den
         FROM s""",
    "q177_concurrency" ->
      """WITH pts AS (
           SELECT epoch_ns(ts) // 1000000000 AS t, 1 AS delta,
             event_id AS eid
           FROM events
           UNION ALL
           SELECT epoch_ns(ts) // 1000000000 + 600, -1, event_id
           FROM events),
         cum AS (
           SELECT t, CAST(sum(delta) OVER (ORDER BY t, delta, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS conc
           FROM pts)
         SELECT t // 86400 AS day, max(conc) AS peak, count(*) AS n_points
         FROM cum GROUP BY 1""",
    "q178_bitmap_index" ->
      """WITH en AS (
           SELECT doc_id // 63 AS block,
             bit_or(CAST(1 AS BIGINT) << CAST(doc_id % 63 AS INTEGER))
               AS w_en
           FROM documents WHERE lang = 'en' GROUP BY 1),
         lng AS (
           SELECT doc_id // 63 AS block,
             bit_or(CAST(1 AS BIGINT) << CAST(doc_id % 63 AS INTEGER))
               AS w_long
           FROM documents WHERE n_chars >= 300 GROUP BY 1)
         SELECT block,
           coalesce(w_en, 0) AS w_en,
           coalesce(w_long, 0) AS w_long,
           CAST(bit_count(coalesce(w_en, 0)) AS BIGINT) AS n_en,
           CAST(bit_count(coalesce(w_en, 0) & coalesce(w_long, 0)) AS BIGINT)
             AS n_and,
           CAST(bit_count(coalesce(w_en, 0) | coalesce(w_long, 0)) AS BIGINT)
             AS n_or
         FROM en FULL OUTER JOIN lng USING (block)""",
    "q179_inverted_index" ->
      """WITH docs AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS tokens
           FROM documents),
         tok AS (
           SELECT doc_id, pos, tokens[pos + 1] AS tok
           FROM (SELECT doc_id, tokens,
                   unnest(range(0, len(tokens))) AS pos
                 FROM docs)),
         h AS (
           SELECT tok, doc_id,
             CAST(('0x' || substr(md5(doc_id || ':' || pos || ':' || tok),
               1, 13)) AS BIGINT) AS hv
           FROM tok)
         SELECT tok, count(DISTINCT doc_id) AS df, count(*) AS cf,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           bit_xor(hv) AS postings_xor
         FROM h GROUP BY tok""",
    "q180_temporal_join" ->
      """WITH segs AS (SELECT DISTINCT c_mktsegment AS seg FROM customer),
         rates AS (
           SELECT seg, CAST(v AS INTEGER) AS ver,
             make_timestamp(CAST(1995 + v * 2 AS BIGINT), 1, 1, 0, 0, 0)
               AS valid_from,
             CAST(('0x' || substr(md5(seg || v), 1, 4)) AS BIGINT) % 500
               + 100 AS rate_bp
           FROM segs, range(3) t(v)),
         facts AS (
           SELECT o_orderkey, o_orderdate, c_mktsegment AS seg
           FROM orders JOIN customer ON o_custkey = c_custkey)
         SELECT f.seg, r.ver, r.rate_bp, count(*) AS n_orders
         FROM facts f
         ASOF LEFT JOIN rates r
           ON f.seg = r.seg AND f.o_orderdate >= r.valid_from
         GROUP BY 1, 2, 3""",
    "q181_exact_median" ->
      """WITH c AS (
           SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
             count(*) AS cnt
           FROM lineitem GROUP BY 1, 2),
         cum AS (
           SELECT l_returnflag, q,
             sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY q) AS cum,
             sum(cnt) OVER (PARTITION BY l_returnflag) AS n
           FROM c)
         SELECT l_returnflag, min(q) AS median_lo,
           CAST(min(n) AS BIGINT) AS n_rows
         FROM cum WHERE 2 * cum >= n GROUP BY 1""",
    "q173_range_frame" ->
      """SELECT event_id, user_id, sec,
           count(*) OVER w AS n_1h,
           CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
         FROM (SELECT event_id, user_id,
                 epoch_ns(ts) // 1000000000 AS sec,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY sec
                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""")
}
