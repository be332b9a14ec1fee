package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-4 analytics wave: capability axes the engine did not yet cover
  * as first-class, oracle-checked queries —
  *
  *   - sparse-vector similarity over an inverted index (q118): the
  *     lexical complement to the dense-embedding ANN family (q40/q49/
  *     q83/q92) — candidates come from shared RARE terms, never from
  *     an all-pairs product, so the pair stage is bounded by posting-
  *     list size (the df cap), the standard trick for pairwise
  *     similarity at web scale;
  *   - iterative graph ranking (q119): fixed-iteration PageRank in
  *     pure integer arithmetic — each round is one join + one
  *     aggregation shuffled by node key, the same loop shape a
  *     1000-executor web-graph rank runs (domain authority is a
  *     classic pretraining-corpus quality signal);
  *   - cohort retention (q120) and ordered funnels (q121) over the
  *     event stream: the two canonical product-analytics shapes, both
  *     expressed so every shuffle lands on `user_id` and co-partitions
  *     across stages;
  *   - semi-structured extraction (q122): JSON payload fields pulled
  *     with `get_json_object` straight into a relational aggregate —
  *     no UDF, stays inside whole-stage codegen;
  *   - corpus snapshot diff (q123): content-hash full-outer diff
  *     (added/removed/changed/unchanged), the data-versioning audit a
  *     training corpus needs between crawl refreshes;
  *   - PMI collocations (q124): phrase mining for tokenizer/vocab
  *     construction — integer micro-nat scores (the q99/q109 trick) so
  *     cross-engine sums and orderings are bit-exact.
  *
  * All seven run over the driver testdata (TESTDATA.md) and hash-match
  * the DuckDB oracle.
  */
object AnalyticsOps {

  type Q = (SparkSession, String) => DataFrame

  /** Tokenize into non-empty lowercase word array (TextOps contract). */
  private def words(c: Column): Column =
    filter(split(lower(c), " "), w => w =!= "")

  private val NsPerWeek = 7L * 86400L * 1000L * 1000L * 1000L

  /** Persist and eagerly materialize an intermediate that the rest of
    * the query fans out from. Without the count(), every downstream
    * subtree races to populate the cache on the first action — measured
    * 5-20× slower end-to-end than materializing once up front (and on a
    * cluster the same race duplicates the scan N times). One cheap
    * count against a tiny cached relation buys a single computation of
    * the shared index.
    */
  private def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** q119's round body, depth-parameterized and driven by
    * [[GraphIter.run]]: r' = 0.15e6 + floor(0.85 · Σ floor(r/deg))
    * over a symmetrized, materialized edge list. Iterations persist
    * LAZILY ([[GraphIter.Lazy]]): each hash-join build populates the
    * previous iteration's cache exactly once (builds are sequential,
    * so there is no multi-consumer race), and skipping per-iteration
    * count() actions drops scheduling round-trips — measured faster
    * than the eager variant at every scale probed. At real depth
    * GraphIter localCheckpoints every `checkpointEvery` rounds so the
    * plan stays O(1) and superseded round caches are released.
    *
    * The rank frame is NODE-sized, so it must never carry a
    * compulsory broadcast hint: at tens of millions of vertices a
    * forced broadcast bypasses AQE's size check and hits the
    * driver/broadcast-memory wall. Instead hint shuffle_hash on the
    * rank side — edges0 is already hash-partitioned on src from its
    * own build, so the shuffle is one-sided and the hash table built
    * per-partition is |V|/numPartitions rows, bounded on any
    * executor. The hint only forbids the driver-sized build path; it
    * does not force a shuffle where AQE would pick something better
    * on a genuinely tiny frame.
    */
  def pagerank(edges0: DataFrame, deg: DataFrame, rounds: Int,
      checkpointEvery: Int = 8,
      mode: GraphIter.Mode = GraphIter.Lazy): DataFrame = {
    val rank0 = deg.select(col("src").as("id"), lit(1000000L).as("r"))
    GraphIter.run(rank0, rounds, checkpointEvery, mode) {
      (rank, _) =>
        val divided = rank.join(deg, rank("id") === deg("src"))
          .select(col("src"), expr("r div deg").as("share"))
        edges0.join(divided.hint("shuffle_hash"), "src")
          .groupBy("dst").agg(sum("share").as("m"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(m * 85) div 100")).as("r"))
    }
  }

  /** STRICT running max of `valueCol` over `orderCol`-DESCENDING order
    * (one input row per orderCol value): each output row's `out` is the
    * max over all rows with strictly larger orderCol, null for the
    * largest. Distributed with the two-phase pattern of
    * [[TextOps.orderedCumsum]]: range-partition descending, partition-
    * local inclusive running max shifted one row for strictness, plus
    * each partition's offset = max of all earlier (larger-value)
    * partitions' maxima, collected (one tiny row per partition) and
    * broadcast back. No single-partition window at any size.
    */
  private[graft] def strictPrefixMaxDesc(df: DataFrame, orderCol: String,
      valueCol: String, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df
      .repartitionByRange(col(orderCol).desc)
      .sortWithinPartitions(col(orderCol).desc)
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy("_pid").orderBy(col(orderCol).desc)
    val withLocal = ranged
      .withColumn("_incl", max(col(valueCol)).over(w))
      .withColumn("_lag", lag(col("_incl"), 1).over(w))
    val totals = withLocal.groupBy("_pid")
      .agg(max(col(valueCol)).as("_total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // partition offset = running max of all EARLIER partitions' maxima
    // (earlier pid = larger orderCol range); None for the first.
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(Option.empty[Long]) {
        (acc, t) => Some(acc.fold(t)(math.max(_, t)))
      })
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(
      offsets.toSeq.map { case (pid, o) => (pid, o) }
        .toDF("_pid", "_offset"))
    // greatest() ignores nulls: strict prefix = max(lagged local
    // inclusive max, earlier partitions' offset), null only for the
    // global first row.
    withLocal.join(offsetDf, Seq("_pid"), "left_outer")
      .withColumn(out, greatest(col("_lag"), col("_offset")))
      .drop("_pid", "_incl", "_lag", "_offset")
  }

  val queries: Map[String, Q] = Map(
    // ---- q118: sparse cosine similarity via inverted index -------------
    // Dense-embedding near-dup (q84) misses lexical overlap when no
    // embedding exists; this is the term-space analogue. Terms are
    // 5-token shingles (raw tokens are useless here AND at web scale:
    // every word is common, so posting lists are quadratic to expand;
    // shingles are discriminative). Candidates: pairs sharing >= 2
    // RARE shingles (2 <= df <= 10) — common shingles generate no
    // candidates, rare ones have bounded posting lists, so the pair
    // stage is O(sum df^2 over rare shingles), never O(n^2). Verify:
    // exact set cosine |A∩B|/sqrt(|A||B|) over the FULL distinct-
    // shingle sets of candidates only, compared as the exact integer
    // (inter^2 * 1e6) div (|A|*|B|) — monotone in cosine, zero
    // floating point anywhere. The verify stage joins each candidate
    // pair to the two PACKED per-doc shingle arrays and intersects
    // in-task (round 7 measured the previous exploded form — cand ×
    // every a-side shingle re-joined on (b_id, sg) — at 17.1× for 10×
    // data: the exploded join shuffled |pairs|·|shingles/doc| rows on
    // two different keys; the packed form moves each doc's array once
    // per side and needs no per-pair groupBy at all).
    "q118_sparse_cosine" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .withColumn("tokens", words(col("text")))
      val sh = materialized(docs.filter(size(col("tokens")) >= 5)
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(sequence(0, size(tokens) - 5),
             i -> concat_ws(' ',
                    element_at(tokens, i + 1), element_at(tokens, i + 2),
                    element_at(tokens, i + 3), element_at(tokens, i + 4),
                    element_at(tokens, i + 5))))""")).as("sg")))
      val rare = sh.groupBy("sg").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 10)).select("sg")
      val postings = sh.join(rare, "sg")
      // materialized: feeds the candidate-doc screen (twice, via the
      // union) AND the final verify join — unpersisted, the bounded
      // but not-free df^2 pair stage would run three times
      val cand = materialized(postings.as("a")
        .join(postings.as("b"),
          col("a.sg") === col("b.sg") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .select("a_id", "b_id"))
      // sg is distinct per doc (array_distinct above), so the packed
      // array IS the shingle set and its size the exact set size.
      // Packed arrays are built ONLY for docs that appear in a
      // candidate pair: the left-semi probe shuffles sh by doc_id —
      // the exact partitioning the groupBy needs anyway, so the screen
      // is free — and drops every non-candidate doc BEFORE the
      // corpus-sized collect_list and the two array-moving verify
      // joins (r09 measured 12.6x sf1 growth with whole-corpus arrs;
      // candidates are df<=10-bounded, so this side is output-sized).
      val candDocs = cand.select(col("a_id").as("doc_id"))
        .union(cand.select(col("b_id").as("doc_id"))).distinct()
      val arrs = sh.join(candDocs, Seq("doc_id"), "left_semi")
        .groupBy("doc_id")
        .agg(collect_list(col("sg")).as("arr"))
      cand
        .join(arrs.select(col("doc_id").as("a_id"),
          col("arr").as("a_arr")), "a_id")
        .join(arrs.select(col("doc_id").as("b_id"),
          col("arr").as("b_arr")), "b_id")
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("a_arr"), col("b_arr")))
            .cast("long").as("inter"),
          size(col("a_arr")).cast("long").as("na"),
          size(col("b_arr")).cast("long").as("nb"))
        .withColumn("cos2_micro",
          expr("(inter * inter * 1000000L) div (na * nb)"))
        .filter(col("cos2_micro") >= 250000L)
        .select("a_id", "b_id", "inter", "cos2_micro")
    }),

    // ---- q119: fixed-iteration integer PageRank ------------------------
    // Customer<->supplier trade graph (distinct edges from
    // lineitem |x| orders, symmetrized). Rank in integer micro-units:
    // r0 = 1e6; r' = 0.15e6 + floor(0.85 * sum(floor(r/deg))). Three
    // rounds, each one broadcast-able deg join + one shuffle on the
    // destination node — the plan a web-scale rank uses (per-iteration
    // checkpoint/persist replaces lineage growth at real depth; three
    // unrolled rounds keep the oracle expressible). All arithmetic is
    // integer division on positives, so Spark and DuckDB agree bit-
    // for-bit. Top-20 by rank with deterministic tie-break.
    "q119_pagerank" -> ((s, d) => {
      // Nodes are LONGS end-to-end — customer 2k, supplier 2k+1 — so
      // every distinct/join/shuffle moves 8-byte keys; the 'c…'/'s…'
      // labels are synthesized only for the final 20 rows. (String
      // node ids measured ~30% slower over the whole loop.)
      val eo = table(s, d, "lineitem")
        .join(table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // Pre-join deg onto the edge list once and cache THAT: each
      // iteration then only touches (src, dst, deg), so the loop has
      // no duplicated subtrees — without this, iteration k's plan
      // nests k copies of the edge+deg subtree whose broadcast stages
      // race to recompute shared intermediates (measured 10-20×
      // slower and wildly erratic even at sf0.01). Each iteration is
      // Symmetrize with one explode instead of union(eo, eo.swap):
      // the un-cached join+distinct subtree is evaluated once, not
      // twice. Only the two genuinely shared bases (edge list and
      // degrees) are eagerly materialized; the per-node degree stays
      // on the TINY rank side of each iteration (rank ⋈ deg, then
      // broadcast) instead of being denormalized onto 2|E| edge rows
      // — the old edges⋈deg materialization moved the full edge list
      // through an extra shuffle+cache for a value the broadcast
      // carries for free (measured ~15% of the query).
      // half-size eo is the cached frame; the symmetrized edge list is
      // a map-only projection of it per consumer (caching post-explode
      // re-plans the join+distinct subtree once per explode branch
      // inside the InMemoryRelation — the round-7 q194 plan audit
      // caught lineitem⋈orders running twice; same fix here)
      val eoM = materialized(eo)
      val edges0 = eoM
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val deg = materialized(
        edges0.groupBy("src").agg(count(lit(1)).as("deg")))
      pagerank(edges0, deg, rounds = 3)
        .orderBy(col("r").desc, col("id").asc).limit(20)
        .select(concat(
          when(col("id") % 2 === 0, lit("c")).otherwise(lit("s")),
          expr("id div 2")).as("id"), col("r"))
    }),

    // ---- q120: cohort retention matrix ---------------------------------
    // Users bucketed by first-seen week; each later active week counts
    // toward (cohort_week, weeks_since) — the standard retention
    // triangle. Two shuffles, both on user_id (dedup + cohort agg);
    // the final matrix is at most cohorts x horizon, tiny at any data
    // size. Week index = integer ns-epoch division, engine-exact.
    "q120_cohort_retention" -> ((s, d) => {
      val ev = materialized(table(s, d, "events")
        .select(col("user_id"), expr(s"ts div $NsPerWeek").as("wk"))
        .distinct())
      val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("wk_offset"))
        .agg(countDistinct("user_id").as("n_users"))
    }),

    // ---- q121: ordered funnel (view -> click -> purchase) --------------
    // Strictly-ordered event sequences per user: first view, first
    // click AFTER that view, first purchase AFTER that click. Three
    // conditional min-aggregations, every one keyed on user_id so the
    // stage joins co-partition; timestamps compared as exact ns longs.
    // Output is the 3-row funnel with completion counts (monotone by
    // construction — asserted in AnalyticsSpec).
    "q121_funnel_steps" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("n_users"))
        .select(lit("1_view").as("stage"), col("n_users"))
        .unionByName(c.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("stage"), col("n_users")))
        .unionByName(p.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("stage"), col("n_users")))
    }),

    // ---- q122: semi-structured JSON payload extraction ------------------
    // The props column is a JSON document; get_json_object pulls the
    // field inside codegen (no UDF, no driver parse), and the result
    // feeds an ordinary relational aggregate — schema-on-read over an
    // opaque payload column, entirely map-side until the final group.
    "q122_json_extract" -> ((s, d) => {
      table(s, d, "events")
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k").isNotNull)
        .groupBy(col("event_type"), expr("k div 10").as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
    }),

    // ---- q123: corpus snapshot diff (data versioning) -------------------
    // Two corpus versions diffed by content hash in one full-outer
    // join on the stable doc key: added / removed / changed /
    // unchanged. Here v1/v2 are deterministic slices of the documents
    // table (v1 lacks doc_id % 17 == 0 and has pre-edit text for
    // doc_id % 13 == 0; v2 lacks doc_id % 19 == 0) — the operator is
    // the diff itself, which at 100 TB is a single co-partitioned
    // full-outer join on doc_id with map-side hashing, no text ever
    // shuffled (hashes only).
    "q123_snapshot_diff" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val v1 = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 13 === 0,
            substring(col("text"), 1, 10))
            .otherwise(col("text"))).as("h1"))
      val v2 = docs.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("h2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") === col("h2"), "unchanged")
            .otherwise("changed"))
        .groupBy("status").agg(count(lit(1)).as("n"))
    }),

    // ---- q125: binned range join (point-in-interval) --------------------
    // Naive `p.ts BETWEEN i.start AND i.end` joins plan as a nested-
    // loop product — O(points × intervals), dead at scale. The binned
    // form maps each interval onto the fixed-width time bins it
    // covers (explode) and each point onto its single containing bin,
    // turning the range join into a hash EQUI-join on bin id + an
    // exact residual filter. Pair work is bounded by points-per-bin ×
    // intervals-per-bin; a point lives in exactly one bin so no
    // dedup step is needed. Works big-big (shuffle hash on bin) —
    // here the 25-interval side broadcasts, same plan shape.
    // Intervals: 25 deterministic campaign windows derived from
    // nation (stride 90 d, width 20-140 d — widths exceed the stride
    // so windows overlap and some orders match several). All times
    // compared as epoch-millis longs, engine-exact.
    "q125_range_join" -> ((s, d) => {
      val dayMs = 86400000L
      val base = 788918400000L // 1995-01-01 UTC
      val bin = 30L * dayMs
      val win = table(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("w_id"))
        .withColumn("start_ms", lit(base) + col("w_id") * (90L * dayMs))
        .withColumn("end_ms",
          col("start_ms") + (col("w_id") % 7 + 1) * (20L * dayMs))
      val binned = win.select(col("w_id"), col("start_ms"), col("end_ms"),
        explode(sequence(expr(s"start_ms div ${bin}L"),
          expr(s"end_ms div ${bin}L"))).as("bin"))
      table(s, d, "orders")
        // o_orderdate is TIMESTAMP_NTZ; session TZ is pinned UTC, so
        // the cast matches DuckDB's naive-timestamp epoch_ms exactly.
        .select(unix_millis(col("o_orderdate").cast("timestamp")).as("o_ms"),
          col("o_totalprice"))
        .withColumn("bin", expr(s"o_ms div ${bin}L"))
        .join(binned, "bin")
        .filter(col("o_ms").between(col("start_ms"), col("end_ms")))
        .groupBy("w_id")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice")).cast("long")).as("sum_price"))
    }),

    // ---- q126: 2-D Pareto frontier (skyline) ----------------------------
    // Curation wants the set of documents not dominated on (length,
    // lexical diversity): doc p survives iff no q has x>=x_p AND
    // y>=y_p with one strict. The naive form is an O(n²) NOT EXISTS
    // self-join; the distributed form reduces per x-group first
    // (groupBy x -> max y, one shuffle), then takes a STRICT running
    // max over x-descending groups with the two-phase prefix pattern
    // (range partition + partition-local window + broadcast partition
    // maxima — no single-partition window, same trick as
    // TextOps.orderedCumsum), and joins the tiny frontier test back.
    // A point survives iff y == its group max AND y > every group max
    // at strictly larger x. Work: one shuffle over points, one range
    // shuffle over DISTINCT x values, one join back on x.
    "q126_pareto_frontier" -> ((s, d) => {
      val pts = table(s, d, "documents")
        .withColumn("tokens", words(col("text")))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("x"),
          size(array_distinct(col("tokens"))).cast("long").as("y"))
      val grp = pts.groupBy("x").agg(max("y").as("gy"))
      val strictMax = strictPrefixMaxDesc(grp, "x", "gy", "sy")
      pts.join(broadcast(strictMax), "x")
        .filter(col("y") === col("gy") &&
          (col("sy").isNull || col("y") > col("sy")))
        .select("doc_id", "x", "y")
    }),

    // ---- q127: Z-order (Morton) clustering layout -----------------------
    // The 100 TB data-skipping layout: interleave the bits of two
    // bucketed dimensions into one Morton code, range-partition /
    // sort files by it, and every file covers a NARROW range of BOTH
    // dimensions — min/max footer pruning then works for predicates
    // on either column, which a single-column sort gives only for the
    // leading column. Here: lineitem bucketed 12 bits on part key and
    // 12 bits on ship-date day, spread/interleaved with the classic
    // shift-and-mask ladder (pure long arithmetic, bit-identical in
    // any engine), then per-4096-code chunk (≈ a file) min/max spans
    // of BOTH dims — the direct measure of pruning quality a layout
    // optimizer would inspect.
    "q127_zorder" -> ((s, d) => {
      def spread(c: Column): Column = {
        // 16-bit value -> even bit positions of a 32-bit lane
        val a = bitwise_and(c.bitwiseOR(shiftleft(c, 8)), lit(0x00FF00FFL))
        val b = bitwise_and(a.bitwiseOR(shiftleft(a, 4)), lit(0x0F0F0F0FL))
        val e = bitwise_and(b.bitwiseOR(shiftleft(b, 2)), lit(0x33333333L))
        bitwise_and(e.bitwiseOR(shiftleft(e, 1)), lit(0x55555555L))
      }
      def bitwise_and(a: Column, b: Column): Column = a.bitwiseAND(b)
      table(s, d, "lineitem")
        .select(col("l_partkey"),
          expr("unix_millis(cast(l_shipdate as timestamp)) div 86400000")
            .as("day"))
        .withColumn("xb", pmod(col("l_partkey"), lit(4096)).cast("long"))
        .withColumn("yb", pmod(col("day"), lit(4096)))
        .withColumn("z",
          spread(col("xb")).bitwiseOR(shiftleft(spread(col("yb")), 1)))
        .groupBy(expr("z div 4096").as("chunk"))
        .agg(count(lit(1)).as("n"),
          min("xb").as("x_min"), max("xb").as("x_max"),
          min("yb").as("y_min"), max("yb").as("y_max"))
    }),

    // ---- q128: token-entropy quality score ------------------------------
    // Shannon entropy of each document's token distribution — the
    // information-theoretic boilerplate signal (low entropy = repeated
    // filler, the thing repetition q90 approximates lexically). Each
    // token's term -(c/n)·ln(c/n) is floored to integer micro-nats
    // INDIVIDUALLY and the integers summed (the q99 recipe), so the
    // result is independent of summation order — stable under any
    // partitioning, bit-equal across engines evaluating the same IEEE
    // expression tree. One (doc, token) shuffle with map-side combine
    // (per-doc vocab bounded), one per-doc merge.
    "q128_token_entropy" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("tok"))
      val counts = docs.groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("c"))
      val n = counts.groupBy("doc_id").agg(sum("c").as("n"))
      counts.join(n, "doc_id")
        .withColumn("term_micro",
          floor(lit(-1e6) * (col("c").cast("double") / col("n")) *
            log(col("c").cast("double") / col("n"))).cast("long"))
        .groupBy("doc_id")
        .agg(max("n").as("n_tokens"),
          sum("term_micro").as("entropy_micro"))
    }),

    // ---- q124: PMI collocations (phrase mining) -------------------------
    // pmi(a,b) = ln( p(ab) / (p(a) p(b)) ) over adjacent-token bigrams,
    // floored to integer micro-nats (exactly the q99/q109 recipe: both
    // engines evaluate the same IEEE expression tree, so the floor is
    // bit-identical). One token shuffle for unigrams, one bigram
    // shuffle, corpus totals broadcast back as scalars. min-count 5
    // keeps the tail stable; top-25 with full deterministic tie-break.
    "q124_collocations" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .withColumn("tokens", words(col("text")))
      val uni = materialized(docs
        .select(explode(col("tokens")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt")))
      val totalU = uni.agg(sum("cnt").as("tu"))
      val bi = docs.filter(size(col("tokens")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(tokens) - 2),
             i -> struct(element_at(tokens, i + 1) AS a,
                         element_at(tokens, i + 2) AS b))""")).as("p"))
        .select(col("p.a"), col("p.b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
      val totalB = docs
        .select((greatest(size(col("tokens")) - 1, lit(0)))
          .cast("long").as("nb"))
        .agg(sum("nb").as("tb"))
      bi
        .join(broadcast(uni.select(col("tok").as("a"),
          col("cnt").as("ca"))), "a")
        .join(broadcast(uni.select(col("tok").as("b"),
          col("cnt").as("cb"))), "b")
        .crossJoin(broadcast(totalU))
        .crossJoin(broadcast(totalB))
        .withColumn("pmi_micro",
          floor(log(
            (col("cab").cast("double") * col("tu") * col("tu")) /
              ((col("tb").cast("double") * col("ca")) * col("cb")))
            * 1e6).cast("long"))
        .select("a", "b", "cab", "pmi_micro")
        .orderBy(col("pmi_micro").desc, col("a").asc, col("b").asc)
        .limit(25)
    }),

    // ---- q152: SCD2 history from two corpus snapshots ------------------
    // The lakehouse merge a refreshing 100 TB corpus runs on every
    // crawl: derive slowly-changing-dimension type-2 rows (validity
    // interval + current flag, keyed by content hash) from an
    // old/new snapshot pair in ONE full-outer join on the natural
    // key. Unchanged docs keep their open v1 row; changed docs close
    // v1 at batch 2 and open a current v2; deletes close v1; inserts
    // open at batch 2 — the union reads the joined frame twice, so
    // it is persisted and eagerly populated once. Snapshots are
    // carved deterministically from `documents` (old = id%10<9,
    // new = id%11≠5 with id%7=0 rewritten), so both engines see
    // identical batches without any side input.
    "q152_scd2_history" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val old = docs.filter(pmod(col("doc_id"), lit(10)) < 9)
        .select(col("doc_id"), md5(col("text")).as("oh"))
      val neu = docs.filter(pmod(col("doc_id"), lit(11)) =!= 5)
        .select(col("doc_id"), md5(concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit(" rev2"))
            .otherwise(lit("")))).as("nh"))
      val j = old.join(neu, Seq("doc_id"), "full_outer")
        .withColumn("changed",
          col("oh").isNotNull && col("nh").isNotNull &&
            col("oh") =!= col("nh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      j.count()
      val closedOrOpen = j.filter(col("oh").isNotNull).select(
        col("doc_id"), col("oh").as("content_v"),
        lit(1).as("valid_from"),
        when(col("changed") || col("nh").isNull, lit(2))
          .otherwise(lit(null).cast("int")).as("valid_to"),
        (!(col("changed") || col("nh").isNull)).as("is_current"))
      val opened = j
        .filter(col("nh").isNotNull && (col("oh").isNull || col("changed")))
        .select(col("doc_id"), col("nh").as("content_v"),
          lit(2).as("valid_from"), lit(null).cast("int").as("valid_to"),
          lit(true).as("is_current"))
      closedOrOpen.unionAll(opened)
    })
  )

  val oracle: Map[String, String] = Map(
    "q152_scd2_history" ->
      """WITH old AS (
           SELECT doc_id, md5(text) AS oh FROM documents
           WHERE doc_id % 10 < 9),
         neu AS (
           SELECT doc_id, md5(text ||
             CASE WHEN doc_id % 7 = 0 THEN ' rev2' ELSE '' END) AS nh
           FROM documents WHERE doc_id % 11 <> 5),
         j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.oh, n.nh,
                 (o.oh IS NOT NULL AND n.nh IS NOT NULL AND o.oh <> n.nh)
                   AS changed
               FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id)
         SELECT doc_id, oh AS content_v, 1 AS valid_from,
           CASE WHEN changed OR nh IS NULL THEN 2 ELSE NULL END
             AS valid_to,
           NOT (changed OR nh IS NULL) AS is_current
         FROM j WHERE oh IS NOT NULL
         UNION ALL
         SELECT doc_id, nh, 2, NULL, true FROM j
         WHERE nh IS NOT NULL AND (oh IS NULL OR changed)""",
    "q118_sparse_cosine" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split(lower(text), ' '),
             w -> w <> '') AS t FROM documents),
         sh AS (SELECT DISTINCT doc_id, sg FROM (
           SELECT doc_id, unnest(list_transform(range(0, len(t) - 4),
             i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                  t[i+4] || ' ' || t[i+5])) AS sg
           FROM toks WHERE len(t) >= 5)),
         sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh
                   FROM sh GROUP BY doc_id),
         rare AS (SELECT sg FROM (
                    SELECT sg, count(*) AS df FROM sh GROUP BY sg)
                  WHERE df BETWEEN 2 AND 10),
         cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                  FROM sh a JOIN rare USING (sg)
                       JOIN sh b ON a.sg = b.sg AND a.doc_id < b.doc_id
                  GROUP BY 1, 2 HAVING count(*) >= 2),
         inter AS (SELECT c.a_id, c.b_id,
                          CAST(count(*) AS BIGINT) AS inter
                   FROM cand c
                   JOIN sh sa ON sa.doc_id = c.a_id
                   JOIN sh sb ON sb.doc_id = c.b_id AND sb.sg = sa.sg
                   GROUP BY c.a_id, c.b_id)
         SELECT i.a_id, i.b_id, i.inter,
                CAST((i.inter * i.inter * 1000000) // (na.nsh * nb.nsh)
                  AS BIGINT) AS cos2_micro
         FROM inter i
         JOIN sizes na ON na.doc_id = i.a_id
         JOIN sizes nb ON nb.doc_id = i.b_id
         WHERE (i.inter * i.inter * 1000000) // (na.nsh * nb.nsh)
               >= 250000""",
    "q119_pagerank" ->
      """WITH eo AS (
           SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM eo
                   UNION ALL SELECT dst, src FROM eo),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
         c1 AS (SELECT e.dst, r.r // d.deg AS share FROM edges e
                JOIN r0 r ON r.id = e.src JOIN deg d ON d.src = e.src),
         r1 AS (SELECT dst AS id,
                  CAST(150000 + (sum(share) * 85) // 100 AS BIGINT) AS r
                FROM c1 GROUP BY dst),
         c2 AS (SELECT e.dst, r.r // d.deg AS share FROM edges e
                JOIN r1 r ON r.id = e.src JOIN deg d ON d.src = e.src),
         r2 AS (SELECT dst AS id,
                  CAST(150000 + (sum(share) * 85) // 100 AS BIGINT) AS r
                FROM c2 GROUP BY dst),
         c3 AS (SELECT e.dst, r.r // d.deg AS share FROM edges e
                JOIN r2 r ON r.id = e.src JOIN deg d ON d.src = e.src),
         r3 AS (SELECT dst AS id,
                  CAST(150000 + (sum(share) * 85) // 100 AS BIGINT) AS r
                FROM c3 GROUP BY dst)
         SELECT CASE WHEN id % 2 = 0 THEN 'c' || CAST(id // 2 AS BIGINT)
                     ELSE 's' || CAST(id // 2 AS BIGINT) END AS id, r
         FROM (SELECT id, r FROM r3 ORDER BY r DESC, id ASC LIMIT 20)""",
    "q120_cohort_retention" ->
      """WITH ev AS (
           SELECT DISTINCT user_id,
                  epoch_ns(ts) // 604800000000000 AS wk FROM events),
         cohort AS (SELECT user_id, min(wk) AS cohort_wk
                    FROM ev GROUP BY user_id)
         SELECT c.cohort_wk, e.wk - c.cohort_wk AS wk_offset,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM ev e JOIN cohort c USING (user_id)
         GROUP BY c.cohort_wk, e.wk - c.cohort_wk""",
    "q121_funnel_steps" ->
      """WITH v AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t2 FROM events e
               JOIN v ON v.user_id = e.user_id
               WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t1
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t3 FROM events e
               JOIN c ON c.user_id = e.user_id
               WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t2
               GROUP BY e.user_id)
         SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
         UNION ALL
         SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
         UNION ALL
         SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p""",
    "q122_json_extract" ->
      """SELECT event_type, k // 10 AS k_bucket,
                count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT event_type,
                 CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                   AS k
               FROM events)
         WHERE k IS NOT NULL
         GROUP BY event_type, k // 10""",
    "q123_snapshot_diff" ->
      """WITH v1 AS (
           SELECT doc_id,
                  md5(CASE WHEN doc_id % 13 = 0 THEN substr(text, 1, 10)
                           ELSE text END) AS h1
           FROM documents WHERE doc_id % 17 <> 0),
         v2 AS (SELECT doc_id, md5(text) AS h2
                FROM documents WHERE doc_id % 19 <> 0)
         SELECT CASE WHEN h1 IS NULL THEN 'added'
                     WHEN h2 IS NULL THEN 'removed'
                     WHEN h1 = h2 THEN 'unchanged'
                     ELSE 'changed' END AS status,
                count(*) AS n
         FROM v1 FULL OUTER JOIN v2 USING (doc_id)
         GROUP BY 1""",
    "q128_token_entropy" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             string_split(lower(text), ' '), w -> w <> '')) AS tok
           FROM documents),
         counts AS (SELECT doc_id, tok, count(*) AS c
                    FROM toks GROUP BY doc_id, tok),
         n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
               FROM counts GROUP BY doc_id)
         SELECT counts.doc_id, max(n.n) AS n_tokens,
                CAST(sum(CAST(floor(
                  -1e6 * (CAST(c AS DOUBLE) / n.n)
                       * ln(CAST(c AS DOUBLE) / n.n)) AS BIGINT))
                  AS BIGINT) AS entropy_micro
         FROM counts JOIN n USING (doc_id)
         GROUP BY counts.doc_id""",
    "q127_zorder" ->
      """WITH b0 AS (
           SELECT l_partkey % 4096 AS xb,
                  (epoch_ms(l_shipdate) // 86400000) % 4096 AS yb
           FROM lineitem),
         s1 AS (SELECT xb, yb,
                  (xb | (xb << 8)) & 16711935 AS xs,
                  (yb | (yb << 8)) & 16711935 AS ys FROM b0),
         s2 AS (SELECT xb, yb,
                  (xs | (xs << 4)) & 252645135 AS xs,
                  (ys | (ys << 4)) & 252645135 AS ys FROM s1),
         s3 AS (SELECT xb, yb,
                  (xs | (xs << 2)) & 858993459 AS xs,
                  (ys | (ys << 2)) & 858993459 AS ys FROM s2),
         s4 AS (SELECT xb, yb,
                  (xs | (xs << 1)) & 1431655765 AS xs,
                  (ys | (ys << 1)) & 1431655765 AS ys FROM s3)
         SELECT (xs | (ys << 1)) // 4096 AS chunk,
                count(*) AS n,
                min(xb) AS x_min, max(xb) AS x_max,
                min(yb) AS y_min, max(yb) AS y_max
         FROM s4 GROUP BY 1""",
    "q126_pareto_frontier" ->
      """WITH pts AS (
           SELECT doc_id, CAST(len(text) AS BIGINT) AS x,
                  CAST(len(list_distinct(list_filter(
                    string_split(lower(text), ' '), w -> w <> '')))
                    AS BIGINT) AS y
           FROM documents)
         SELECT p.doc_id, p.x, p.y FROM pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM pts q
           WHERE q.x >= p.x AND q.y >= p.y
             AND (q.x > p.x OR q.y > p.y))""",
    "q125_range_join" ->
      """WITH win AS (
           SELECT CAST(n_nationkey AS BIGINT) AS w_id,
                  788918400000 + n_nationkey * 7776000000 AS start_ms,
                  788918400000 + n_nationkey * 7776000000
                    + ((n_nationkey % 7) + 1) * CAST(1728000000 AS BIGINT)
                      AS end_ms
           FROM nation)
         SELECT w_id, count(*) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                  AS sum_price
         FROM orders JOIN win
           ON epoch_ms(o_orderdate) BETWEEN start_ms AND end_ms
         GROUP BY w_id""",
    "q124_collocations" ->
      """WITH toks AS (
           SELECT list_filter(string_split(lower(text), ' '), w -> w <> '')
             AS tokens FROM documents),
         uni AS (SELECT tok, count(*) AS cnt FROM (
                   SELECT unnest(tokens) AS tok FROM toks) GROUP BY tok),
         tu AS (SELECT CAST(sum(cnt) AS BIGINT) AS tu FROM uni),
         bi AS (SELECT a, b, count(*) AS cab FROM (
                  SELECT unnest(list_transform(range(0, len(tokens) - 1),
                           i -> tokens[i + 1])) AS a,
                         unnest(list_transform(range(0, len(tokens) - 1),
                           i -> tokens[i + 2])) AS b
                  FROM toks WHERE len(tokens) >= 2)
                GROUP BY a, b HAVING count(*) >= 5),
         tb AS (SELECT CAST(sum(greatest(len(tokens) - 1, 0)) AS BIGINT)
                  AS tb FROM toks)
         SELECT bi.a, bi.b, CAST(bi.cab AS BIGINT) AS cab,
                CAST(floor(ln(
                  (CAST(bi.cab AS DOUBLE) * tu.tu * tu.tu) /
                  ((CAST(tb.tb AS DOUBLE) * ua.cnt) * ub.cnt)) * 1e6)
                  AS BIGINT) AS pmi_micro
         FROM bi
         JOIN uni ua ON ua.tok = bi.a
         JOIN uni ub ON ub.tok = bi.b, tu, tb
         ORDER BY pmi_micro DESC, bi.a ASC, bi.b ASC LIMIT 25"""
  )
}
