package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 16: the tokenizer-apply / robust-stats / interval-join
  * tier.
  *
  *   - q202 BPE apply: the learned merge table (q191's training loop)
  *     applied to the WHOLE corpus — greedy left-to-right merge
  *     application expressed as a chain of bounded string replaces over
  *     a doubled-space encoding (provably equal to the per-token greedy
  *     scan; see the operator comment). Learn on the sample, tokenize
  *     the corpus: the standard tokenizer deployment shape.
  *   - q203 winsorized group statistics: robust revenue stats with the
  *     clip bounds at exact RANK positions (integer arithmetic, no
  *     interpolated quantiles) — engine-exact where quantile_cont
  *     interpolation would drift in the last ulp.
  *   - q204 interval-overlap join: activity-interval pairs ACROSS users
  *     via time-slab bucketing with responsible-slab dedup — the
  *     interval×interval member of the join family (q125 is
  *     point-in-interval), never a quadratic self-join.
  *   - q205 linear multi-touch attribution: every click within 7 days
  *     of a purchase shares the credit equally (integer cents split) —
  *     completes the attribution family: last-touch backward as-of
  *     (q70/q114), next-touch forward as-of (q201), multi-touch here.
  *   - q206 l-diversity audit: distinct-sensitive-value counts per
  *     quasi-identifier group — the privacy-release complement of
  *     q155's k-anonymity.
  */
object Wave16Ops {

  type Q = (SparkSession, String) => DataFrame

  /** 7-day attribution window (ns). */
  private val AttrWindowNs = 604800000000000L

  val queries: Map[String, Q] = Map(
    // ---- q202: BPE tokenizer apply -------------------------------------
    // Merges come from q191's training loop (learned on the doc_id%10
    // sample — 3 bounded driver rows, the tokenizer's merge table).
    // Application to the full corpus is greedy left-to-right, per merge,
    // in merge order — exactly what `replace` does on a doubled-space
    // encoding: " a  b " patterns cannot overlap their own replacement
    // (" a_b " keeps single-space edges, and the neighbours' doubled
    // boundaries survive), and left-to-right non-overlapping replacement
    // IS greedy BPE application for one rule (Wave16Spec proves equality
    // with a per-token greedy scan on every doc). Each replace is one
    // codegen'd string pass — no token explode, no per-round shuffle:
    // applying a 32k-merge vocabulary at 100 TB stays a map-only job
    // (chunked into a few hundred replaces per projection).
    "q202_bpe_apply" -> ((s, d) => {
      val merges = Wave14Ops.queries("q191_bpe_merges")(s, d)
        .orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2)))
      val doubled = concat(lit(" "),
        call_function("replace", lower(col("text")), lit(" "), lit("  ")),
        lit(" "))
      val applied = merges.foldLeft(doubled) { case (c, (x, y)) =>
        call_function("replace", c, lit(s" $x  $y "), lit(s" $x~$y "))
      }
      table(s, d, "documents")
        .select(col("doc_id"),
          size(filter(split(lower(col("text")), " "), w => length(w) > 0))
            .cast("long").as("n_before"),
          size(filter(split(applied, " "), w => length(w) > 0))
            .cast("long").as("n_after"))
        .withColumn("n_merged", col("n_before") - col("n_after"))
    }),

    // ---- q203: winsorized group statistics -----------------------------
    // Revenue cents per nation, clipped at the exact rank-position
    // bounds lo = value@rank((5(n-1)) div 100 + 1), hi = value@rank(
    // (95(n-1)) div 100 + 1) — pure integer arithmetic end to end, so
    // the robust sum is engine-exact (interpolated quantiles differ in
    // the last ulp across engines and were rejected for the gate). One
    // window pass + one grouped aggregation, both hashed on the group.
    "q203_winsorized_stats" -> ((s, d) => {
      val v = table(s, d, "orders")
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("grp"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val byGrp = Window.partitionBy("grp")
      val rk = v
        .withColumn("rn", row_number().over(byGrp.orderBy("cents")).cast("long"))
        .withColumn("n", count(lit(1)).over(byGrp))
      val bounds = rk.groupBy("grp").agg(
        max(when(col("rn") === expr("(5 * (n - 1)) div 100 + 1"),
          col("cents"))).as("lo"),
        max(when(col("rn") === expr("(95 * (n - 1)) div 100 + 1"),
          col("cents"))).as("hi"))
      rk.join(bounds, "grp")
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          min("lo").as("lo_cents"), min("hi").as("hi_cents"),
          sum(when(col("cents") < col("lo"), col("lo"))
            .when(col("cents") > col("hi"), col("hi"))
            .otherwise(col("cents"))).as("winsorized_sum_cents"),
          sum(when(col("cents") < col("lo") || col("cents") > col("hi"), 1L)
            .otherwise(0L)).as("n_clipped"))
    }),

    // ---- q204: interval-overlap join (endpoint sweep) ------------------
    // Per-user activity islands (q185's gaps-and-islands), then pairs of
    // DIFFERENT users with overlapping islands, for a probe panel
    // (u1 % 20 == 0). Two prior shapes hit their floor here: round 7's
    // fixed 6-hour slab equi-join grew 38.8× at 10× data (density per
    // slab quadratic), and round 8's density-derived width still stood
    // at 24.6× vs the oracle's 9.4× — the r09 diagnosis measured WHY:
    // slab population is uniform (no skew to salt) and the derived
    // width already minimized candidates at 131.6M for 5.6M output
    // pairs (23× overkill, ~invariant across widths). The slab-join
    // STRATEGY was the bottleneck, so q204 now runs
    // [[IntervalSweep.overlapPairs]]: islands time-range-partitioned
    // and swept in start order with boundary-crossing carries — every
    // emission is a qualifying pair (O(n log A + output), A = peak
    // concurrency), the same asymptotics as the single-node oracle's
    // sort-based interval join. Result is partitioning-invariant; the
    // oracle and hash are unchanged (IntervalSweepSpec pins sweep ==
    // brute force across range widths).
    "q204_interval_overlap" -> ((s, d) => {
      val byTime = Window.partitionBy("user_id")
        .orderBy(col("t"), col("event_id"))
      val prevEnd = max("iv_end")
        .over(byTime.rowsBetween(Window.unboundedPreceding, -1))
      val iv = table(s, d, "events")
        .select(col("user_id"), col("ts").as("t"), col("event_id"),
          (col("ts") + lit(1800000000000L)).as("iv_end"))
        .withColumn("ni",
          when(prevEnd.isNull || col("t") > prevEnd, 1L).otherwise(0L))
        .withColumn("island", sum("ni")
          .over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "island")
        .agg(min("t").as("s"), max("iv_end").as("e"))
      IntervalSweep.overlapPairs(iv, probeMod = 20L)
    }),

    // ---- q205: linear multi-touch attribution --------------------------
    // Every click in the 7 days before a purchase shares the purchase
    // value equally (integer cents div — deterministic, no float
    // credit). One equi-join on user_id with the range predicate as a
    // post-join filter (at warehouse scale: co-partition both sides on
    // (user, time-bucket) — same refinement as the bounded as-of), one
    // per-purchase window for the touch count, one grouped sum per
    // click.
    "q205_linear_attribution" -> ((s, d) => {
      val ev = table(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pt"),
          floor(col("value") * 100).cast("long").as("cents"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("ct"))
      p.join(c, Seq("user_id"))
        .filter(col("ct") > col("pt") - lit(AttrWindowNs) &&
          col("ct") <= col("pt"))
        .withColumn("n_touch",
          count(lit(1)).over(Window.partitionBy("purchase_id")))
        .groupBy("click_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum(expr("cents div n_touch")).as("credited_cents"))
    }),

    // ---- q206: l-diversity audit ---------------------------------------
    // q155's quasi-identifier groups (nation × market segment), sensitive
    // attribute = $1000 account-balance band. A group is safe when it
    // holds >= 3 distinct sensitive values — k-anonymity (group size)
    // says nothing when everyone in the group shares the sensitive
    // value. floor(x/1000) (not integer div) so negative balances band
    // correctly in both engines. One grouped count-distinct, hashed on
    // the quasi-identifier.
    "q206_l_diversity" -> ((s, d) => {
      table(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct("band").as("l_distinct"))
        .withColumn("diverse", col("l_distinct") >= 3L)
    }))

  val oracle: Map[String, String] = Map(
    "q202_bpe_apply" -> {
      // the merge table is q191's oracle CTE chain; application is the
      // doubled-space replace chain with patterns built from the three
      // learned (x, y) scalar pairs
      val learn =
        """t0 AS (
           SELECT doc_id,
                  unnest(range(1, len(tk) + 1)) AS pos,
                  unnest(tk) AS t
           FROM (SELECT doc_id,
                        list_filter(string_split(lower(text), ' '),
                                    w -> w <> '') AS tk
                 FROM documents WHERE doc_id % 10 = 0)),
         n1 AS (SELECT doc_id, pos, t,
                       lead(t) OVER w AS nxt, lag(t) OVER w AS prv
                FROM t0 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         b1 AS (SELECT t AS x, nxt AS y, count(*) AS cnt FROM n1
                WHERE nxt IS NOT NULL AND t <> nxt
                GROUP BY t, nxt ORDER BY cnt DESC, t, nxt LIMIT 1),
         t1 AS (SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                         AS pos,
                       CASE WHEN t = b.x AND nxt = b.y
                            THEN t || '~' || nxt ELSE t END AS t
                FROM n1 CROSS JOIN b1 b
                WHERE NOT COALESCE(prv = b.x AND t = b.y, false)),
         n2 AS (SELECT doc_id, pos, t,
                       lead(t) OVER w AS nxt, lag(t) OVER w AS prv
                FROM t1 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         b2 AS (SELECT t AS x, nxt AS y, count(*) AS cnt FROM n2
                WHERE nxt IS NOT NULL AND t <> nxt
                GROUP BY t, nxt ORDER BY cnt DESC, t, nxt LIMIT 1),
         t2 AS (SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                         AS pos,
                       CASE WHEN t = b.x AND nxt = b.y
                            THEN t || '~' || nxt ELSE t END AS t
                FROM n2 CROSS JOIN b2 b
                WHERE NOT COALESCE(prv = b.x AND t = b.y, false)),
         n3 AS (SELECT doc_id, pos, t,
                       lead(t) OVER w AS nxt, lag(t) OVER w AS prv
                FROM t2 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         b3 AS (SELECT t AS x, nxt AS y, count(*) AS cnt FROM n3
                WHERE nxt IS NOT NULL AND t <> nxt
                GROUP BY t, nxt ORDER BY cnt DESC, t, nxt LIMIT 1)"""
      s"""WITH $learn
         SELECT doc_id,
                CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> w <> '')) AS BIGINT) AS n_before,
                CAST(len(list_filter(string_split(
                  replace(replace(replace(
                    ' ' || replace(lower(text), ' ', '  ') || ' ',
                    ' ' || (SELECT x FROM b1) || '  ' ||
                      (SELECT y FROM b1) || ' ',
                    ' ' || (SELECT x FROM b1) || '~' ||
                      (SELECT y FROM b1) || ' '),
                    ' ' || (SELECT x FROM b2) || '  ' ||
                      (SELECT y FROM b2) || ' ',
                    ' ' || (SELECT x FROM b2) || '~' ||
                      (SELECT y FROM b2) || ' '),
                    ' ' || (SELECT x FROM b3) || '  ' ||
                      (SELECT y FROM b3) || ' ',
                    ' ' || (SELECT x FROM b3) || '~' ||
                      (SELECT y FROM b3) || ' '),
                  ' '), w -> w <> '')) AS BIGINT) AS n_after,
                CAST(len(list_filter(string_split(lower(text), ' '),
                    w -> w <> ''))
                  - len(list_filter(string_split(
                  replace(replace(replace(
                    ' ' || replace(lower(text), ' ', '  ') || ' ',
                    ' ' || (SELECT x FROM b1) || '  ' ||
                      (SELECT y FROM b1) || ' ',
                    ' ' || (SELECT x FROM b1) || '~' ||
                      (SELECT y FROM b1) || ' '),
                    ' ' || (SELECT x FROM b2) || '  ' ||
                      (SELECT y FROM b2) || ' ',
                    ' ' || (SELECT x FROM b2) || '~' ||
                      (SELECT y FROM b2) || ' '),
                    ' ' || (SELECT x FROM b3) || '  ' ||
                      (SELECT y FROM b3) || ' ',
                    ' ' || (SELECT x FROM b3) || '~' ||
                      (SELECT y FROM b3) || ' '),
                  ' '), w -> w <> '')) AS BIGINT) AS n_merged
         FROM documents"""
    },
    "q203_winsorized_stats" ->
      """WITH v AS (
           SELECT c_nationkey AS grp,
                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey),
         rk AS (
           SELECT grp, cents,
                  row_number() OVER (PARTITION BY grp ORDER BY cents)
                    AS rn,
                  count(*) OVER (PARTITION BY grp) AS n
           FROM v),
         bounds AS (
           SELECT grp,
                  max(CASE WHEN rn = (5 * (n - 1)) // 100 + 1
                           THEN cents END) AS lo,
                  max(CASE WHEN rn = (95 * (n - 1)) // 100 + 1
                           THEN cents END) AS hi
           FROM rk GROUP BY grp)
         SELECT r.grp, CAST(count(*) AS BIGINT) AS n,
                CAST(min(b.lo) AS BIGINT) AS lo_cents,
                CAST(min(b.hi) AS BIGINT) AS hi_cents,
                CAST(sum(CASE WHEN cents < b.lo THEN b.lo
                              WHEN cents > b.hi THEN b.hi
                              ELSE cents END) AS BIGINT)
                  AS winsorized_sum_cents,
                CAST(sum(CASE WHEN cents < b.lo OR cents > b.hi
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
         FROM rk r JOIN bounds b ON r.grp = b.grp
         GROUP BY r.grp""",
    "q204_interval_overlap" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) AS t, event_id,
                  epoch_ns(ts) + 1800000000000 AS iv_end
           FROM events),
         marked AS (
           SELECT user_id, t, iv_end, event_id,
                  CASE WHEN max(iv_end) OVER (
                         PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    OR t > max(iv_end) OVER (
                         PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS ni
           FROM ev),
         isl AS (
           SELECT user_id, t, iv_end,
                  sum(ni) OVER (PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS island
           FROM marked),
         iv AS (SELECT user_id, island, min(t) AS s, max(iv_end) AS e
                FROM isl GROUP BY user_id, island)
         SELECT a.user_id AS u1, b.user_id AS u2,
                CAST(count(*) AS BIGINT) AS n_overlaps,
                CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
                  AS overlap_ns
         FROM iv a JOIN iv b
           ON a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
         WHERE a.user_id % 20 = 0
         GROUP BY a.user_id, b.user_id""",
    "q205_linear_attribution" ->
      """WITH p AS (
           SELECT user_id, event_id AS purchase_id, epoch_ns(ts) AS pt,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id, event_id AS click_id, epoch_ns(ts) AS ct
           FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p.purchase_id, p.cents, c.click_id,
                  count(*) OVER (PARTITION BY p.purchase_id) AS n_touch
           FROM p JOIN c ON p.user_id = c.user_id
             AND c.ct > p.pt - 604800000000000 AND c.ct <= p.pt)
         SELECT click_id, CAST(count(*) AS BIGINT) AS n_purchases,
                CAST(sum(cents // n_touch) AS BIGINT) AS credited_cents
         FROM j GROUP BY click_id""",
    "q206_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0)
                  AS BIGINT)) AS BIGINT) AS l_distinct,
                count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                  >= 3 AS diverse
         FROM customer GROUP BY c_nationkey, c_mktsegment""")
}
