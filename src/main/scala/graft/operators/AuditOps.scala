package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-4 audit wave: corpus-governance and behavior-analytics shapes
  * a 100 TB training-data pipeline runs between ingestion and training —
  *
  *   - deterministic per-source sampling (q130): the "cap every source
  *     at k documents" QA draw, keyed by a content-independent hash so
  *     the sample is reproducible across reruns and engines;
  *   - cross-source overlap audit (q131): pairwise shingle-set Jaccard
  *     between sources — the "how much of dump B is already in dump A"
  *     question every corpus refresh asks. Candidates come from the
  *     per-source-distinct shingle posting lists, so the pair stage is
  *     bounded by #sources per shingle, never an all-pairs product;
  *   - time-decayed engagement (q132): per-user exponentially decayed
  *     activity score in pure integer arithmetic (micro-units halved
  *     per age period via arithmetic shift), so the cross-engine sums
  *     are bit-exact — the freshness-weighting trick for "recency
  *     score" columns without float-sum nondeterminism;
  *   - event-transition matrix (q133): first-order Markov counts +
  *     per-prior probabilities (ppm) over each user's event timeline —
  *     lead() per user, then one tiny aggregate;
  *   - per-language quality deciles (q134): type-token-ratio scored
  *     docs ntile(10)'d WITHIN language — per-group thresholds are the
  *     correct curation filter when languages differ in baseline
  *     quality (a global cut would silently drop low-resource langs);
  *   - one-pass column profiling (q135): null count / exact distinct /
  *     min / max for every column of a table in a SINGLE scan (the
  *     multi-distinct Expand), unpivoted with stack() into the
  *     (column, stats) shape a data-catalog expects.
  *
  * All six hash-match the DuckDB oracle on the driver testdata.
  * Reference context: the reference's QA surface is row counts and
  * spot queries (`dedup_parquet.py` prints per-table row counts); these
  * are the corpus-scale generalizations of that audit step.
  */
object AuditOps {

  type Q = (SparkSession, String) => DataFrame

  /** Tokenize into non-empty lowercase word array (TextOps contract). */
  private def words(c: Column): Column =
    filter(split(lower(c), " "), w => w =!= "")

  /** 3-day half-life period for q132, in event-time nanoseconds. */
  private val NsPerPeriod = 3L * 86400L * 1000L * 1000L * 1000L

  val queries: Map[String, Q] = Map(
    // ---- q130: deterministic k-per-source sample -----------------------
    // Order inside each source by md5(doc_id) — a content-independent
    // uniform draw that reruns identically anywhere md5 exists. The
    // window is partitioned by source, so the sort is per-group; at
    // 100 TB with huge groups, prepend a hash-prefix prefilter
    // (keep h < bound chosen from the per-source counts) so the exact
    // rank only sees ~k×slack rows per group instead of the full group.
    "q130_sample_per_source" -> ((s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(col("h"), col("doc_id"))
      table(s, d, "documents")
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .select(col("source"), col("doc_id"), col("rn"))
    }),

    // ---- q131: cross-source shingle overlap (Jaccard, ppm) -------------
    // Sets are DISTINCT (source, shingle) — so every posting list the
    // pair stage joins through is at most #sources long by
    // construction. The shuffles are: one distinct (by source+shingle),
    // one join keyed by shingle, one pair aggregate. No stage is
    // quadratic in corpus size; the output is #source-pairs rows.
    "q131_source_overlap" -> ((s, d) => {
      // Persisted AND eagerly materialized: the tokenize→shingle→
      // distinct subtree feeds three consumers (set sizes + both join
      // sides). Lazy persist lets the three subtrees race to populate
      // the cache (each runs the full scan); one cheap count() up
      // front buys a single computation.
      val sh = table(s, d, "documents")
        .withColumn("tokens", words(col("text")))
        .filter(size(col("tokens")) >= 3)
        .select(col("source"), explode(expr(
          """transform(sequence(0, size(tokens) - 3),
               i -> concat_ws(' ', slice(tokens, i + 1, 3)))"""))
          .as("shingle"))
        .distinct()
        .persist()
      sh.count()
      val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
      sh.select(col("source").as("src_a"), col("shingle"))
        .join(sh.select(col("source").as("src_b"), col("shingle")),
          "shingle")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("source").as("src_a"), col("n").as("na")),
          "src_a")
        .join(sizes.select(col("source").as("src_b"), col("n").as("nb")),
          "src_b")
        .select(col("src_a"), col("src_b"), col("inter"),
          expr("(inter * 1000000) div (na + nb - inter)")
            .as("jaccard_ppm"))
    }),

    // ---- q132: time-decayed engagement score ---------------------------
    // decayed = Σ floor(value·1e6) >> age_periods — halving per 3-day
    // period. Integer end-to-end after the one floor(), so partial
    // aggregation (map-side combine) is exact and order-independent:
    // the whole query is one broadcast of the max-ts scalar plus one
    // shuffle on user_id. Float-weighted sums (value·0.5^age) would be
    // partition-order-dependent; the shift formulation is not.
    "q132_time_decay" -> ((s, d) => {
      val e = table(s, d, "events")
      val ref = e.agg(max(col("ts")).as("ref_ts"))
      e.crossJoin(broadcast(ref))
        .withColumn("age_p",
          expr(s"cast((ref_ts - ts) div ${NsPerPeriod}L as int)"))
        .withColumn("micro",
          expr("cast(floor(value * 1000000.0) as bigint)"))
        .groupBy("user_id")
        .agg(sum(expr("shiftright(micro, age_p)")).as("decayed_micro"),
          count(lit(1)).as("n_events"))
    }),

    // ---- q133: first-order event-transition matrix ---------------------
    // lead() inside each user's timeline (one shuffle, keyed by
    // user_id — co-partitioned with every other per-user stage), then
    // a tiny (type × type) aggregate joined against per-prior totals.
    "q133_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val tr = table(s, d, "events")
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = tr.groupBy("from_type").agg(sum("n").as("tot"))
      tr.join(tot, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          expr("(n * 1000000) div tot").as("ppm"))
    }),

    // ---- q134: per-language quality deciles ----------------------------
    // Score = type-token ratio in ppm (integer-exact). ntile(10) is
    // made deterministic by the (score, doc_id) total order; the decile
    // cut points are per-language, which is the honest way to threshold
    // quality across languages with different baselines.
    "q134_quality_deciles" -> ((s, d) => {
      val scored = table(s, d, "documents")
        .withColumn("t", words(col("text")))
        .filter(size(col("t")) > 0)
        .select(col("lang"), col("doc_id"),
          expr("""(cast(size(array_distinct(t)) as bigint) * 1000000)
                  div size(t)""").as("ttr_ppm"))
      val w = Window.partitionBy("lang")
        .orderBy(col("ttr_ppm"), col("doc_id"))
      scored.withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("lang", "decile")
        .agg(count(lit(1)).as("n_docs"),
          min("ttr_ppm").as("min_ttr"), max("ttr_ppm").as("max_ttr"))
    }),

    // ---- q141: rolling time-series features ----------------------------
    // The feature-engineering pass a behavioral model trains on: per
    // event, the previous value (lag 1) and the rolling count/sum over
    // the trailing 5-row frame of that user's timeline. One shuffle
    // keyed on user_id (co-partitioned with q132/q133); frames are
    // ROWS-bounded so window state is O(frame), and values ride as
    // integer cents so the rolling sums are engine-exact.
    "q141_lag_features" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(-4, 0)
      table(s, d, "events")
        .withColumn("cents", expr("cast(floor(value * 100) as bigint)"))
        .select(col("event_id"), col("user_id"), col("cents"),
          lag(col("cents"), 1).over(w).as("prev_cents"),
          count(lit(1)).over(wf).cast("long").as("roll_n"),
          sum(col("cents")).over(wf).as("roll_cents"))
    }),

    // ---- q142: top user journeys ---------------------------------------
    // The "what do users actually do" report: each user's first five
    // events as an ordered path string, counted across users. The rank
    // and the ordered path aggregation both key on user_id (one
    // shuffle, co-partitioned with the rest of the per-user family);
    // the path table is at most |event_type|^5 rows.
    "q142_user_journeys" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      table(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy("user_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
    }),

    // ---- q143: rolling 7-day active users ------------------------------
    // DAU + trailing-7-day WAU per day. Exact sliding distinct without
    // a per-day window sort: each (user, day) activity row fans out to
    // the ≤7 trailing window-days it supports (map-side sequence+
    // explode), then one distinct + one count per day. Work is
    // 7 × |active (user, day)| — linear, partitioned by day, no
    // quadratic day×day join, no global sort.
    "q143_rolling_dau" -> ((s, d) => {
      val ud = table(s, d, "events")
        .select(expr("ts div 86400000000000").as("day"), col("user_id"))
        .distinct().persist()
      ud.count()
      val mx = ud.agg(max("day").as("mx"))
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(explode(expr("sequence(day, day + 6)")).as("day"),
          col("user_id"))
        .distinct()
        .crossJoin(broadcast(mx)).filter(col("day") <= col("mx"))
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
    }),

    // ---- q144: anomalous-day detection, integer-exact ------------------
    // Days whose event count deviates > 2σ from the mean — in PURE
    // integer arithmetic: with N days, S = Σx, Q = Σx²,
    // (x − μ)² > 4σ² ⇔ (N·x − S)² > 4·(N·Q − S²). No float mean/std,
    // so the flag is bit-identical under any partitioning and engine.
    // Daily counts are one shuffle; the (N, S, Q) triple is a
    // broadcast scalar.
    "q144_anomaly_days" -> ((s, d) => {
      val daily = table(s, d, "events")
        .select(expr("ts div 86400000000000").as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_events")).persist()
      daily.count()
      val stats = daily.agg(count(lit(1)).as("nd"),
        sum("n_events").as("s"),
        sum(expr("n_events * n_events")).as("q"))
      daily.crossJoin(broadcast(stats))
        .select(col("day"), col("n_events"),
          expr("nd * n_events - s").as("dev"),
          expr("""(nd * n_events - s) * (nd * n_events - s)
                  > 4 * (nd * q - s * s)""").as("is_anomaly"))
    }),

    // ---- q145: conversion latency distribution -------------------------
    // Time from first 'view' to first 'purchase' per user, bucketed by
    // hour. Conditional min-timestamps collapse each user to one row in
    // a single user_id-keyed aggregation (the q121 funnel recipe); the
    // bucket histogram is a second tiny aggregate.
    "q145_conversion_latency" -> ((s, d) => {
      table(s, d, "events")
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("v"),
          min(when(col("event_type") === "purchase", col("ts"))).as("p"))
        .filter(col("v").isNotNull && col("p").isNotNull &&
          col("p") >= col("v"))
        .withColumn("latency_s", expr("(p - v) div 1000000000"))
        .withColumn("bucket_h", expr("latency_s div 3600"))
        .groupBy("bucket_h")
        .agg(count(lit(1)).as("n_users"),
          min("latency_s").as("min_s"), max("latency_s").as("max_s"))
    }),

    // ---- q135: column profile, two map-combined passes -----------------
    // Every column's null count, exact distinct count, and (where the
    // string rendering is engine-portable: integers and strings) min /
    // max. NOT the obvious `agg(countDistinct(c1), countDistinct(c2),
    // …)`: six distinct aggregates in one agg plan as Expand + a
    // THREE-level SortAggregate cascade keyed on all six columns at
    // once — row-unique groups, fully sorted, twice (measured 3.1 s
    // warm at sf0.1 for a 150k-row table). Instead:
    //   pass 1 — global agg (nulls, min, max): grouping-key-free, one
    //     partial+final pair, map-side combined;
    //   pass 2 — unpivot to (col_name, value-string) → distinct →
    //     count by col_name: the per-partition partial dedup bounds
    //     shuffle volume by the distinct-value count, the standard
    //     exact-profiling shape at any scale (~0.9 s warm, 3.5×).
    // Value strings are injective renderings, so distinct counts equal
    // native distinct counts. Doubles / timestamps keep null
    // min_s/max_s (their renderings are not engine-portable); their
    // null and distinct counts are real.
    "q135_profile_stats" -> ((s, d) => {
      val o = table(s, d, "orders")
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val strSafe = Set("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority")
      val aggs = cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")) ++
          (if (strSafe(c))
            Seq(min(col(c)).cast("string").as(s"min_$c"),
              max(col(c)).cast("string").as(s"max_$c"))
          else Nil)
      }
      val wide = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val nd = o.select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
          .as("p"))
        .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
        .filter(col("v").isNotNull)
        .distinct()
        .groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
      def pick(f: String => String, eligible: String => Boolean,
          zero: Column) =
        cols.filter(eligible).foldLeft(zero) { (acc, c) =>
          when(col("col_name") === c, col(f(c))).otherwise(acc)
        }
      nd.crossJoin(broadcast(wide))
        .select(col("col_name"), col("n_rows"),
          pick(c => s"null_$c", _ => true, lit(null).cast("long"))
            .as("n_null"),
          col("n_distinct"),
          pick(c => s"min_$c", strSafe, lit(null).cast("string"))
            .as("min_s"),
          pick(c => s"max_$c", strSafe, lit(null).cast("string"))
            .as("max_s"))
    }),

    // ---- q154: event-time out-of-order audit ---------------------------
    // The batch-side justification for every streaming watermark
    // choice: per user, how many events arrive with an event-time
    // EARLIER than something already seen (arrival order = event_id),
    // and how late the worst one is. An event is late iff ts < the
    // running max of all prior ts; lateness is measured against that
    // running max. One user_id shuffle; the window frame is
    // ROWS-bounded per user (running max carries O(1) state). Reading
    // this table's p99 max_late straight off sets the watermark delay
    // the streaming jobs (q52/q66/q67) should configure.
    "q154_out_of_order" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      table(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_max", max("ts").over(w))
        .withColumn("late",
          col("prev_max").isNotNull && col("ts") < col("prev_max"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
          coalesce(max(when(col("late"), col("prev_max") - col("ts"))),
            lit(0L)).as("max_late_ns"))
    }),

    // ---- q155: k-anonymity audit over quasi-identifiers ----------------
    // Governance gate before releasing user-derived training data:
    // every (nation, market-segment) quasi-identifier combination must
    // cover at least k individuals, else the group is re-identifiable
    // and must be suppressed or generalized. One shuffle on the
    // quasi-identifier tuple with map-side combine; output is
    // |combinations| rows — constant-bounded however large the
    // customer table grows, so the audit is O(n) map work at any
    // scale. k=50 mirrors the usual release-review threshold.
    "q155_k_anonymity" -> ((s, d) => {
      table(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .withColumn("anonymous", col("n") >= 50L)
    }),

    // ---- q159: tombstone purge (right-to-erasure propagation) ----------
    // The GDPR/takedown path: a tombstone list of deleted ids must be
    // propagated through EVERY derived table — documents and their
    // embedding rows here — and the purge must be auditable. The
    // tombstone list is small relative to the corpus (it is the set of
    // deletion requests), so each propagation is a BROADCAST anti-join:
    // one map-side pass per table, no shuffle of the 100 TB side, which
    // is why erasure over a petabyte lake is an O(scan) nightly job and
    // not a re-partitioning event. Output is the per-table audit row
    // (before/after/purged) that the compliance log keeps.
    "q159_tombstone_purge" -> ((s, d) => {
      val tomb = table(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(13)) === 0)
        .select(col("doc_id").as("del_id"))
      def audit(df: DataFrame, key: String, name: String): DataFrame = {
        val after = df.join(broadcast(tomb),
          col(key) === col("del_id"), "left_anti")
        df.agg(count(lit(1)).as("n_before"))
          .crossJoin(after.agg(count(lit(1)).as("n_after")))
          .select(lit(name).as("table_name"), col("n_before"),
            col("n_after"), (col("n_before") - col("n_after")).as("n_purged"))
      }
      audit(table(s, d, "documents"), "doc_id", "documents")
        .unionByName(
          audit(table(s, d, "embeddings"), "vec_id", "embeddings"))
    }),

    // ---- q161: time-travel snapshot reconstruction ---------------------
    // The lakehouse "AS OF version" read path over a commit log:
    // inserts at v1, updates (docs ≡0 mod 7) at v2, deletes (≡0 mod
    // 13) at v3. Every log entry fans out MAP-SIDE to the versions it
    // is visible in (explode(sequence(ver, 3))) — no non-equi join, so
    // no nested-loop plan — and per (version, doc) the latest entry
    // wins via max_by. Output is the per-version audit a snapshot
    // reader would see: live/tombstone counts + lexicographic hash
    // bounds as a content checksum. At real scale the fan-out factor
    // is the number of RETAINED versions (bounded by the vacuum
    // policy), not table size, and both shuffles carry map-side
    // combine.
    "q161_time_travel" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val ops =
        docs.select(col("doc_id"), lit(1).as("ver"), lit("I").as("op"),
            md5(col("text")).as("h"))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 0)
            .select(col("doc_id"), lit(2).as("ver"), lit("U").as("op"),
              md5(concat(col("text"), lit(" v2"))).as("h")))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(13)) === 0)
            .select(col("doc_id"), lit(3).as("ver"), lit("D").as("op"),
              // sentinel, not NULL: max_by/arg_max null-skipping
              // differs across engines, '' keeps both deterministic
              lit("").as("h")))
      ops
        .withColumn("v", explode(expr("sequence(ver, 3)")))
        .groupBy("v", "doc_id")
        .agg(expr("max_by(op, ver)").as("op"),
          expr("max_by(h, ver)").as("h"))
        .groupBy(col("v").as("version"))
        .agg(sum(when(col("op") =!= "D", 1L).otherwise(0L)).as("n_live"),
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deleted"),
          min(when(col("op") =!= "D", col("h"))).as("min_h"),
          max(when(col("op") =!= "D", col("h"))).as("max_h"))
    }),

    // ---- q163: zone-map data skipping audit ----------------------------
    // File-level min/max statistics are THE scan reducer at 100 TB:
    // a shard whose [min, max] range misses the predicate is never
    // opened. This audit materializes the zone maps (per-shard min/max
    // of n_chars), marks which shards a `n_chars >= 900` scan could
    // skip, and JOINS BACK the true per-shard match counts to prove
    // the skipping sound (skippable shard ⇒ zero matches — the
    // invariant a corrupted stats file would break). Two shard-keyed
    // aggregations over one scan shape; output is |shards| rows.
    "q163_zone_maps" -> ((s, d) => {
      val sharded = table(s, d, "documents")
        .select(pmod(col("doc_id"), lit(20)).as("shard"), col("n_chars"))
      val zones = sharded.groupBy("shard")
        .agg(min("n_chars").as("min_c"), max("n_chars").as("max_c"),
          count(lit(1)).as("n_rows"))
      val matches = sharded.filter(col("n_chars") >= 900)
        .groupBy("shard").agg(count(lit(1)).as("n_match"))
      zones.join(matches, Seq("shard"), "left_outer")
        .select(col("shard"), col("min_c"), col("max_c"), col("n_rows"),
          (col("max_c") < 900).as("can_skip"),
          coalesce(col("n_match"), lit(0L)).as("n_match"))
    }))

  private val shingleSetsCte =
    """sh AS (
         SELECT DISTINCT source, shingle FROM (
           SELECT source,
             unnest(list_transform(range(0, len(tokens) - 2),
               i -> array_to_string(list_slice(tokens, i + 1, i + 3), ' ')))
               AS shingle
           FROM (SELECT source,
                   list_filter(string_split(lower(text), ' '), w -> w <> '')
                     AS tokens
                 FROM documents)
           WHERE len(tokens) >= 3))"""

  val oracle: Map[String, String] = Map(
    "q154_out_of_order" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ns(ts) AS tsn,
             max(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
           FROM events)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (prev_max IS NOT NULL AND tsn < prev_max)
             AS BIGINT) AS n_late,
           CAST(coalesce(max(prev_max - tsn)
             FILTER (prev_max IS NOT NULL AND tsn < prev_max), 0)
             AS BIGINT) AS max_late_ns
         FROM e GROUP BY user_id""",
    "q155_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n, count(*) >= 50 AS anonymous
         FROM customer GROUP BY 1, 2""",
    "q161_time_travel" ->
      """WITH ops AS (
           SELECT doc_id, 1 AS ver, 'I' AS op, md5(text) AS h
           FROM documents
           UNION ALL
           SELECT doc_id, 2, 'U', md5(text || ' v2')
           FROM documents WHERE doc_id % 7 = 0
           UNION ALL
           SELECT doc_id, 3, 'D', ''
           FROM documents WHERE doc_id % 13 = 0),
         fan AS (
           SELECT doc_id, ver, op, h, unnest(range(ver, 4)) AS v
           FROM ops),
         snap AS (
           SELECT v, doc_id, arg_max(op, ver) AS op, arg_max(h, ver) AS h
           FROM fan GROUP BY 1, 2)
         SELECT v AS version,
           CAST(count(*) FILTER (op <> 'D') AS BIGINT) AS n_live,
           CAST(count(*) FILTER (op = 'D') AS BIGINT) AS n_deleted,
           min(h) FILTER (op <> 'D') AS min_h,
           max(h) FILTER (op <> 'D') AS max_h
         FROM snap GROUP BY v""",
    "q163_zone_maps" ->
      """WITH sh AS (
           SELECT doc_id % 20 AS shard, n_chars FROM documents),
         zones AS (
           SELECT shard, min(n_chars) AS min_c, max(n_chars) AS max_c,
             count(*) AS n_rows
           FROM sh GROUP BY shard),
         m AS (
           SELECT shard, count(*) AS n_match FROM sh
           WHERE n_chars >= 900 GROUP BY shard)
         SELECT z.shard, z.min_c, z.max_c, z.n_rows,
           z.max_c < 900 AS can_skip,
           CAST(coalesce(m.n_match, 0) AS BIGINT) AS n_match
         FROM zones z LEFT JOIN m USING (shard)""",
    "q159_tombstone_purge" ->
      """WITH tomb AS (
           SELECT doc_id AS del_id FROM documents WHERE doc_id % 13 = 0)
         SELECT 'documents' AS table_name,
           (SELECT count(*) FROM documents) AS n_before,
           (SELECT count(*) FROM documents
            WHERE doc_id NOT IN (SELECT del_id FROM tomb)) AS n_after,
           (SELECT count(*) FROM documents)
             - (SELECT count(*) FROM documents
                WHERE doc_id NOT IN (SELECT del_id FROM tomb)) AS n_purged
         UNION ALL
         SELECT 'embeddings',
           (SELECT count(*) FROM embeddings),
           (SELECT count(*) FROM embeddings
            WHERE vec_id NOT IN (SELECT del_id FROM tomb)),
           (SELECT count(*) FROM embeddings)
             - (SELECT count(*) FROM embeddings
                WHERE vec_id NOT IN (SELECT del_id FROM tomb))""",
    "q130_sample_per_source" ->
      """SELECT source, doc_id, rn FROM (
           SELECT source, doc_id,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS rn
           FROM documents)
         WHERE rn <= 10""",

    "q131_source_overlap" ->
      s"""WITH $shingleSetsCte,
         sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
         iv AS (SELECT a.source AS src_a, b.source AS src_b,
                  count(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.source < b.source
                GROUP BY 1, 2)
         SELECT iv.src_a, iv.src_b, iv.inter,
           (iv.inter * 1000000) // (za.n + zb.n - iv.inter) AS jaccard_ppm
         FROM iv JOIN sz za ON iv.src_a = za.source
                 JOIN sz zb ON iv.src_b = zb.source""",

    "q132_time_decay" ->
      """WITH ref AS (SELECT max(epoch_ns(ts)) AS ref_ts FROM events)
         SELECT user_id,
           CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)
                    >> CAST((ref_ts - epoch_ns(ts)) // 259200000000000
                            AS INT)) AS BIGINT) AS decayed_micro,
           count(*) AS n_events
         FROM events, ref GROUP BY user_id""",

    "q133_markov_transitions" ->
      """WITH tr AS (
           SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, count(*) AS n
               FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
               FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n, (c.n * 1000000) // t.tot AS ppm
         FROM c JOIN t ON c.from_type = t.from_type""",

    "q134_quality_deciles" ->
      """WITH q AS (
           SELECT lang, doc_id,
             (CAST(len(list_distinct(t)) AS BIGINT) * 1000000) // len(t)
               AS ttr_ppm
           FROM (SELECT lang, doc_id,
                   list_filter(string_split(lower(text), ' '), w -> w <> '')
                     AS t
                 FROM documents)
           WHERE len(t) > 0),
         b AS (SELECT lang, ttr_ppm,
                 CAST(ntile(10) OVER (
                   PARTITION BY lang ORDER BY ttr_ppm, doc_id) AS BIGINT)
                   AS decile
               FROM q)
         SELECT lang, decile, count(*) AS n_docs,
           min(ttr_ppm) AS min_ttr, max(ttr_ppm) AS max_ttr
         FROM b GROUP BY 1, 2""",

    "q142_user_journeys" ->
      """WITH o AS (
           SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
               FROM o WHERE rn <= 5 GROUP BY user_id)
         SELECT path, count(*) AS n_users FROM p GROUP BY path""",

    "q143_rolling_dau" ->
      """WITH ud AS (
           SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id
           FROM events),
         mx AS (SELECT max(day) AS mx FROM ud),
         w AS (SELECT DISTINCT day, user_id FROM (
           SELECT unnest(range(u.day, u.day + 7)) AS day, u.user_id
           FROM ud u)
           WHERE day <= (SELECT mx FROM mx)),
         wau AS (SELECT day, count(*) AS wau FROM w GROUP BY day),
         dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
         SELECT d.day, d.dau, w2.wau
         FROM dau d JOIN wau w2 ON d.day = w2.day""",

    "q144_anomaly_days" ->
      """WITH daily AS (
           SELECT epoch_ns(ts) // 86400000000000 AS day,
             count(*) AS n_events
           FROM events GROUP BY 1),
         st AS (SELECT count(*) AS nd, CAST(sum(n_events) AS BIGINT) AS s,
                  CAST(sum(n_events * n_events) AS BIGINT) AS q
                FROM daily)
         SELECT day, n_events,
           nd * n_events - s AS dev,
           (nd * n_events - s) * (nd * n_events - s)
             > 4 * (nd * q - s * s) AS is_anomaly
         FROM daily, st""",

    "q145_conversion_latency" ->
      """WITH u AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS v,
             min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
               AS p
           FROM events GROUP BY user_id),
         l AS (SELECT (p - v) // 1000000000 AS latency_s FROM u
               WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v)
         SELECT latency_s // 3600 AS bucket_h, count(*) AS n_users,
                min(latency_s) AS min_s, max(latency_s) AS max_s
         FROM l GROUP BY 1""",

    "q141_lag_features" ->
      """SELECT event_id, user_id, cents,
           lag(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_cents,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_n,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS roll_cents
         FROM (SELECT event_id, user_id, ts,
                 CAST(floor(value * 100) AS BIGINT) AS cents
               FROM events)""",

    "q135_profile_stats" -> {
      val specs = Seq(
        ("o_orderkey", true), ("o_custkey", true), ("o_orderstatus", true),
        ("o_totalprice", false), ("o_orderdate", false),
        ("o_orderpriority", true))
      specs.map { case (c, safe) =>
        val mm = if (safe)
          s"CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s"
        else "CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s"
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           count(DISTINCT $c) AS n_distinct, $mm
           FROM orders"""
      }.mkString(" UNION ALL ")
    })
}
