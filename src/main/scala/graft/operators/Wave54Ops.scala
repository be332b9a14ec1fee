package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 54: curation-governance composites.
  *
  *   - q295 dedup method-agreement audit: the Venn decomposition of
  *     exact-hash, verified-MinHash and SimHash duplicate flags — the
  *     report a curation team reads to decide which dedup layers are
  *     redundant and which catch unique families.
  *   - q296 restatement (bitemporal correction) audit: per event-time
  *     day, the metric "as known at the arrival checkpoint" vs the
  *     final value — how much each day's revenue was restated by
  *     late-arriving rows.
  */
object Wave54Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q295: which dedup layers agree? ------------------------------
    // Three independent duplicate signals per document — exact
    // (md5(text) shared with any other doc), near (member of a
    // verified-Jaccard ≥ 0.5 LSH pair — the q291 verify stage), and
    // SimHash (16-bit signature shared) — left-joined onto the corpus
    // and rolled up into the 2³ flag combinations. All three signals
    // are candidate/key-bounded (hash groupBys + the LSH verify);
    // the final rollup is 8 rows. A method that only ever fires
    // alongside another is redundant; a combination like
    // (exact=false, near=true) sizes what MinHash uniquely catches.
    "q295_dedup_method_agreement" -> ((s, d) => {
      // Exact and SimHash flags as COUNT windows over their key instead
      // of groupBy+left-semi self-joins: the former shape scanned the
      // corpus twice per signal (once for the counts, once for the semi
      // probe) and q48 twice; a window computes "does my key repeat"
      // in the signal's one key-partitioned shuffle (guide §2.4). The
      // isNotNull guards pin the semi-join's null semantics (a null
      // key never matched itself, while a window would group nulls).
      // Flag sets — and so the 8-row rollup — are identical.
      import org.apache.spark.sql.expressions.Window
      val texts = table(s, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("th"))
      val exactDocs = texts
        .withColumn("n", count(lit(1)).over(Window.partitionBy("th")))
        .filter(col("n") > 1 && col("th").isNotNull)
        .select(col("doc_id")).withColumn("e", lit(1L))
      val nearDocs = TextOps.verifiedJaccardPairs(s, d)
        .filter(col("jac_ppm") >= 500000L)
        .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
        .distinct().withColumn("nf", lit(1L))
      val simDocs = TextOps.queries("q48_simhash")(s, d)
        .withColumn("n", count(lit(1)).over(Window.partitionBy("simhash")))
        .filter(col("n") > 1 && col("simhash").isNotNull)
        .select(col("doc_id")).withColumn("sf", lit(1L))
      table(s, d, "documents").select(col("doc_id"))
        .join(exactDocs, Seq("doc_id"), "left_outer")
        .join(nearDocs, Seq("doc_id"), "left_outer")
        .join(simDocs, Seq("doc_id"), "left_outer")
        .select(
          (coalesce(col("e"), lit(0L)) === 1L).as("exact_dup"),
          (coalesce(col("nf"), lit(0L)) === 1L).as("near_dup"),
          (coalesce(col("sf"), lit(0L)) === 1L).as("simhash_dup"))
        .groupBy("exact_dup", "near_dup", "simhash_dup")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // ---- q296: late-arrival restatement per event-time day -------------
    // Arrival order is the dense event_id (generation order — the
    // transaction-time axis); the checkpoint is the halfway arrival
    // point. Per EVENT-TIME day: revenue as known at the checkpoint,
    // final revenue, late row count, and the restatement in ppm of
    // final. One conditional-sum aggregate over one corpus pass — the
    // bitemporal audit shape, any scale. (value > 0 corpus invariant
    // keeps rev_final positive, so the single division is exact floor
    // in both engines.)
    "q296_restatement_audit" -> ((s, d) => {
      val ev = table(s, d, "events").select(
        expr("ts div 86400000000000").as("day"),
        col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val ck = ev.agg(expr("max(event_id) div 2").as("ckpt"))
      ev.crossJoin(broadcast(ck))
        .groupBy("day")
        .agg(
          sum(when(col("event_id") <= col("ckpt"), col("cents"))
            .otherwise(0L)).as("rev_at_ckpt"),
          sum("cents").as("rev_final"),
          sum(when(col("event_id") > col("ckpt"), 1L).otherwise(0L))
            .as("n_late"))
        .withColumn("restated_ppm",
          expr("(rev_final - rev_at_ckpt) * 1000000 div rev_final"))
    }))

  /** 16-bit SimHash signature SQL (q48's oracle recipe). */
  private val sim16Bits = (1 to 16).map(i =>
    s"CASE WHEN sum(CASE WHEN substr(md5(tok), $i, 1) >= '8' THEN 1" +
      " ELSE -1 END) > 0 THEN '1' ELSE '0' END").mkString(" || ")

  val oracle: Map[String, String] = Map(
    "q295_dedup_method_agreement" ->
      s"""WITH ${Wave52Ops.lshJacCtes},
          texts AS (SELECT doc_id, md5(text) AS th FROM documents),
          exact_docs AS (
            SELECT DISTINCT doc_id FROM texts
            WHERE th IN (SELECT th FROM texts GROUP BY th
                         HAVING count(*) > 1)),
          near_docs AS (
            SELECT DISTINCT doc_id FROM (
              SELECT a_id AS doc_id FROM jac WHERE jac_ppm >= 500000
              UNION ALL
              SELECT b_id FROM jac WHERE jac_ppm >= 500000)),
          sims AS (
            SELECT doc_id, $sim16Bits AS simhash FROM (
              SELECT doc_id,
                unnest(list_filter(string_split(lower(text), ' '),
                  w -> w <> '')) AS tok
              FROM documents)
            GROUP BY doc_id),
          sim_docs AS (
            SELECT DISTINCT doc_id FROM sims
            WHERE simhash IN (SELECT simhash FROM sims GROUP BY simhash
                              HAVING count(*) > 1)),
          flags AS (
            SELECT d.doc_id,
              e.doc_id IS NOT NULL AS exact_dup,
              n.doc_id IS NOT NULL AS near_dup,
              s.doc_id IS NOT NULL AS simhash_dup
            FROM documents d
            LEFT JOIN exact_docs e ON d.doc_id = e.doc_id
            LEFT JOIN near_docs n ON d.doc_id = n.doc_id
            LEFT JOIN sim_docs s ON d.doc_id = s.doc_id)
          SELECT exact_dup, near_dup, simhash_dup,
            count(*) AS n_docs
          FROM flags GROUP BY 1, 2, 3""",

    "q296_restatement_audit" ->
      """WITH ev AS (
           SELECT epoch_ns(ts) // 86400000000000 AS day, event_id,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         ck AS (SELECT max(event_id) // 2 AS ckpt FROM ev)
         SELECT day,
           CAST(sum(CASE WHEN event_id <= ckpt THEN cents ELSE 0 END)
             AS BIGINT) AS rev_at_ckpt,
           CAST(sum(cents) AS BIGINT) AS rev_final,
           CAST(sum(CASE WHEN event_id > ckpt THEN 1 ELSE 0 END)
             AS BIGINT) AS n_late,
           CAST((sum(cents)
                 - sum(CASE WHEN event_id <= ckpt THEN cents ELSE 0 END))
                * 1000000 // sum(cents) AS BIGINT) AS restated_ppm
         FROM ev, ck GROUP BY day""")
}
