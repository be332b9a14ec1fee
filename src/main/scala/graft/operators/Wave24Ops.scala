package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 24: corpus-health and serving-efficiency audits.
  *
  *   - q235 padding-efficiency audit: length-bucketed batching waste —
  *     how many padded tokens inference burns per bucket vs perfect
  *     packing. The report that justifies (or kills) a sorted-batching
  *     deployment.
  *   - q236 Zipf/heavy-tail audit: token type and occurrence mass per
  *     log2-frequency bin — the rank-frequency evidence that a corpus
  *     has a healthy head/tail split (dedup failures fatten the head;
  *     boilerplate fattens specific bins).
  *   - q237 shingle novelty rate per ingest batch: the fraction of a
  *     batch's distinct shingles never seen in earlier batches — the
  *     diminishing-returns curve crawl curation watches to decide when
  *     a source is mined out.
  */
object Wave24Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Same tokenizer contract as TextOps.words: non-empty lowercase
    * whitespace tokens (DuckDB: list_filter(string_split(...))). */
  private def words(c: Column): Column =
    filter(split(lower(c), " "), w => w =!= "")

  val queries: Map[String, Q] = Map(
    // ---- q235: padding-efficiency audit --------------------------------
    // Bucket documents by token count (width 32); within a bucket,
    // batches of 8 pad every member to the bucket max. padded =
    // ceil(n/8)·8·max_tok; perfect packing = Σ tokens; waste_ppm is
    // the gap. Everything after the per-doc token count (a map) is a
    // bucket-keyed agg — bucket count is bounded by max_len/32, so the
    // report frame is tiny at any corpus size. The same numbers for
    // UNBUCKETED batching fall out of the bucket-0-only variant; the
    // per-bucket report is what a serving team actually tunes against.
    "q235_padding_audit" -> ((s, d) => {
      table(s, d, "documents")
        .select(size(words(col("text"))).cast("long").as("n_tok"))
        .select(expr("n_tok div 32").as("bucket"), col("n_tok"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"),
          max("n_tok").as("max_tok"))
        .withColumn("n_batches", expr("(n_docs + 7) div 8"))
        .withColumn("padded_tok", expr("n_batches * 8 * max_tok"))
        .withColumn("waste_ppm", expr(
          "(padded_tok - sum_tok) * 1000000L div padded_tok"))
    }),

    // ---- q236: Zipf / heavy-tail frequency audit -----------------------
    // Token → corpus frequency (ONE map-side-combined shuffle, the
    // q99 vocabulary pass), then log2 bin via the BINARY-STRING length
    // of the count — floor(log2 f)+1 computed with exact string ops,
    // engine-identical where float log2 drifts at powers of two. Per
    // bin: distinct types, occurrence mass, min/max frequency. A
    // Zipfian corpus shows types halving and mass ~flat per bin; the
    // ~60-row report is the health check.
    "q236_zipf_audit" -> ((s, d) => {
      table(s, d, "documents")
        .select(explode(words(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .select(expr("CAST(length(conv(freq, 10, 2)) AS BIGINT)")
          .as("log2_bin"), col("freq"))
        .groupBy("log2_bin")
        .agg(count(lit(1)).as("n_types"), sum("freq").as("n_occ"),
          min("freq").as("min_freq"), max("freq").as("max_freq"))
    }),

    // ---- q237: shingle novelty rate per ingest batch -------------------
    // Ingest batches of 50 docs (doc_id div 50 — the stand-in for
    // arrival order). A shingle is NEW in the first batch that
    // contains it. distinct (shingle, batch) pairs → per-shingle
    // first batch (min) → per-batch distinct total vs first-here
    // count. Two shingle-keyed aggs + one tiny batch-keyed join; the
    // shingle shuffle carries each distinct (shingle, batch) pair
    // once — at 100 TB the pair key becomes xxhash64(shingle) (q196's
    // recipe), kept as text here for oracle parity.
    "q237_novelty_rate" -> ((s, d) => {
      val pairs = table(s, d, "documents")
        .select(expr("doc_id div 50").as("batch"),
          words(col("text")).as("tokens"))
        .filter(size(col("tokens")) >= 3)
        .select(col("batch"), explode(expr(
          "transform(sequence(0, size(tokens) - 3)," +
            " i -> concat_ws(' ', slice(tokens, i + 1, 3)))"))
          .as("shingle"))
        .distinct()
      val totals = pairs.groupBy("batch")
        .agg(count(lit(1)).as("n_shingles"))
      val firsts = pairs.groupBy("shingle")
        .agg(min("batch").as("batch"))
        .groupBy("batch").agg(count(lit(1)).as("n_new"))
      totals.join(firsts, Seq("batch"), "left_outer")
        .na.fill(0L, Seq("n_new"))
        .withColumn("novelty_ppm",
          expr("n_new * 1000000L div n_shingles"))
    }))

  val oracle: Map[String, String] = Map(
    "q235_padding_audit" ->
      """WITH toks AS (
           SELECT CAST(len(list_filter(string_split(lower(text), ' '),
                    w -> w <> '')) AS BIGINT) AS n_tok
           FROM documents),
         g AS (
           SELECT n_tok // 32 AS bucket, count(*) AS n_docs,
                  sum(n_tok) AS sum_tok, max(n_tok) AS max_tok
           FROM toks GROUP BY 1),
         b AS (
           SELECT *, (n_docs + 7) // 8 AS n_batches FROM g),
         p AS (
           SELECT *, n_batches * 8 * max_tok AS padded_tok FROM b)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(n_docs AS BIGINT) AS n_docs,
                CAST(sum_tok AS BIGINT) AS sum_tok,
                CAST(max_tok AS BIGINT) AS max_tok,
                CAST(n_batches AS BIGINT) AS n_batches,
                CAST(padded_tok AS BIGINT) AS padded_tok,
                CAST((padded_tok - sum_tok) * 1000000 // padded_tok
                  AS BIGINT) AS waste_ppm
         FROM p""",
    "q236_zipf_audit" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
                    w -> w <> '')) AS tok
           FROM documents),
         f AS (SELECT tok, count(*) AS freq FROM tok GROUP BY 1),
         binned AS (
           SELECT CAST(length(bin(freq)) AS BIGINT) AS log2_bin, freq
           FROM f)
         SELECT log2_bin, CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(freq) AS BIGINT) AS n_occ,
                CAST(min(freq) AS BIGINT) AS min_freq,
                CAST(max(freq) AS BIGINT) AS max_freq
         FROM binned GROUP BY 1""",
    "q237_novelty_rate" ->
      """WITH docs AS (
           SELECT doc_id // 50 AS batch,
                  list_filter(string_split(lower(text), ' '),
                    w -> w <> '') AS tokens
           FROM documents),
         pairs AS (
           SELECT DISTINCT batch,
                  unnest(list_transform(range(0, len(tokens) - 2),
                    i -> array_to_string(list_slice(tokens, i + 1,
                      i + 3), ' '))) AS shingle
           FROM docs WHERE len(tokens) >= 3),
         totals AS (
           SELECT batch, count(*) AS n_shingles FROM pairs GROUP BY 1),
         firsts AS (
           SELECT first_batch AS batch, count(*) AS n_new FROM (
             SELECT shingle, min(batch) AS first_batch
             FROM pairs GROUP BY 1) GROUP BY 1)
         SELECT CAST(t.batch AS BIGINT) AS batch,
                CAST(n_shingles AS BIGINT) AS n_shingles,
                CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
                CAST(coalesce(n_new, 0) * 1000000 // n_shingles
                  AS BIGINT) AS novelty_ppm
         FROM totals t LEFT JOIN firsts f ON f.batch = t.batch""")
}
