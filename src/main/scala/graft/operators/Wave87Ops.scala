package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 87: information-theoretic structure tests — a
  * chi-square test of independence on the lang×source contingency
  * grid (is the corpus mix balanced, or does each source push its own
  * languages) and the first-order entropy rate of the event-type
  * process (how predictable is the next user action given the
  * current one — the information-content companion to q280's Markov
  * accuracy).
  */
object Wave87Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q361: lang × source independence test --------------------------
    // One corpus fold to the bounded contingency grid (every
    // lang×source cell, zeros included via the margins cross join);
    // per cell the exact scaled χ² term (o·N − r·c)²·1e6 div (r·c·N)
    // in DECIMAL(38,0) and the signed residual ppm (o·N − r·c)·1e6
    // div (r·c). Output: cells with their terms — the drill-down a
    // mix dashboard needs, not just the scalar statistic.
    "q361_lang_source_independence" -> ((s, d) => {
      val docs = table(s, d, "documents").select("lang", "source")
      val tot = docs.agg(count(lit(1)).as("nn"))
      val rl = docs.groupBy("lang").agg(count(lit(1)).as("r"))
      val cs = docs.groupBy("source").agg(count(lit(1)).as("c"))
      val obs = docs.groupBy("lang", "source")
        .agg(count(lit(1)).as("o"))
      rl.crossJoin(cs)
        .join(obs, Seq("lang", "source"), "left")
        .na.fill(0L, Seq("o"))
        .crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("o"), col("r"), col("c"),
          expr("""CAST(
              (CAST(o AS DECIMAL(38,0)) * nn
               - CAST(r AS DECIMAL(38,0)) * c)
              * (CAST(o AS DECIMAL(38,0)) * nn
                 - CAST(r AS DECIMAL(38,0)) * c) * 1000000
              div (CAST(r AS DECIMAL(38,0)) * c * nn) AS BIGINT)""")
            .as("chi2_term_micro"),
          expr("""CAST((CAST(o AS DECIMAL(38,0)) * nn
               - CAST(r AS DECIMAL(38,0)) * c) * 1000000
              div (CAST(r AS DECIMAL(38,0)) * c) AS BIGINT)""")
            .as("residual_ppm"))
    }),

    // ---- q362: first-order entropy rate of the event process -----------
    // Transitions (cur → next) per user in (ts, event_id) order; the
    // conditional entropy H(next|cur) = −Σ_pairs (n_pair/N)·
    // ln(n_pair/n_cur) in micro-nats — ln on exact-integer ratios
    // with the pinned expression shape, weights as one end-of-sum
    // division per pair cell (the grid is |types|² ≤ 25 rows).
    // Output per current state: its entropy contribution and row
    // count, plus the '__all__' rate rollup.
    "q362_sequence_entropy_rate" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val tr = table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead("cur", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n_pair"))
      val curTot = tr.groupBy("cur").agg(sum("n_pair").as("n_cur"))
      val nAll = tr.agg(sum("n_pair").as("nn"))
      val cells = tr.join(broadcast(curTot), "cur")
        .crossJoin(broadcast(nAll))
        .withColumn("h_term_micro", expr(
          """-(n_pair * CAST(floor(ln((1.0 * n_pair) / n_cur) * 1000000)
             AS BIGINT)) div nn"""))
      val perCur = cells.groupBy("cur")
        .agg(max("n_cur").as("n_transitions"),
          sum("h_term_micro").as("h_micro"))
      perCur.unionByName(
        perCur.agg(sum("n_transitions").as("n_transitions"),
          sum("h_micro").as("h_micro"))
          .select(lit("__all__").as("cur"), col("n_transitions"),
            col("h_micro")))
    }))

  val oracle: Map[String, String] = Map(
    "q361_lang_source_independence" ->
      """WITH docs AS (SELECT lang, source FROM documents),
         tot AS (SELECT count(*) AS nn FROM docs),
         rl AS (SELECT lang, count(*) AS r FROM docs GROUP BY 1),
         cs AS (SELECT source, count(*) AS c FROM docs GROUP BY 1),
         obs AS (SELECT lang, source, count(*) AS o
                 FROM docs GROUP BY 1, 2),
         grid AS (
           SELECT rl.lang, cs.source, rl.r, cs.c,
             coalesce(obs.o, 0) AS o
           FROM rl CROSS JOIN cs
           LEFT JOIN obs ON obs.lang = rl.lang
             AND obs.source = cs.source)
         SELECT lang, source, CAST(o AS BIGINT) AS o,
           CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
           CAST((CAST(o AS HUGEINT) * nn - CAST(r AS HUGEINT) * c)
             * (CAST(o AS HUGEINT) * nn - CAST(r AS HUGEINT) * c)
             * 1000000
             // (CAST(r AS HUGEINT) * c * nn) AS BIGINT)
             AS chi2_term_micro,
           CAST((CAST(o AS HUGEINT) * nn - CAST(r AS HUGEINT) * c)
             * 1000000 // (CAST(r AS HUGEINT) * c) AS BIGINT)
             AS residual_ppm
         FROM grid, tot""",

    "q362_sequence_entropy_rate" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) AS ts, event_id,
             event_type AS cur
           FROM events),
         tr0 AS (
           SELECT cur, lead(cur) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS nxt
           FROM ev),
         tr AS (
           SELECT cur, nxt, count(*) AS n_pair
           FROM tr0 WHERE nxt IS NOT NULL GROUP BY 1, 2),
         ct AS (SELECT cur, sum(n_pair) AS n_cur FROM tr GROUP BY 1),
         nn AS (SELECT sum(n_pair) AS nn FROM tr),
         cells AS (
           SELECT tr.cur,
             -(n_pair * CAST(floor(ln((1.0 * n_pair) / n_cur)
               * 1000000) AS BIGINT)) // nn AS h_term_micro
           FROM tr JOIN ct ON tr.cur = ct.cur, nn),
         per AS (
           SELECT cells.cur,
             CAST(max(ct.n_cur) AS BIGINT) AS n_transitions,
             CAST(sum(h_term_micro) AS BIGINT) AS h_micro
           FROM cells JOIN ct ON cells.cur = ct.cur
           GROUP BY 1)
         SELECT cur, n_transitions, h_micro FROM per
         UNION ALL
         SELECT '__all__', CAST(sum(n_transitions) AS BIGINT),
           CAST(sum(h_micro) AS BIGINT)
         FROM per""")
}
