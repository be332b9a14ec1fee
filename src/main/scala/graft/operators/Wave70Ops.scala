package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.operators.TextOps.words

/** Round-6 wave 70: index structures as relational shapes — a
  * positional phrase-occurrence scan (the inverted-index primitive a
  * search layer runs for exact-phrase queries) and bitmap-index
  * intersection counts (exact distinct-user overlap between event
  * types WITHOUT a distinct-pair shuffle — the audience-overlap
  * query, packed 62 users per machine word).
  */
object Wave70Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q327: exact-phrase occurrence scan ----------------------------
    // Positional trigram postings (one tokenize pass, per-row array
    // lambdas — zero shuffle until the count); the corpus's top
    // trigram is the probe phrase (argmax with full tie-break, so the
    // query is deterministic and non-empty at every SF); occurrences
    // resolve by joining the postings against the 1-row phrase
    // broadcast. Per-doc hit counts and first position out — the
    // phrase-search serving shape where the postings list is the
    // shuffled unit, never the documents.
    "q327_phrase_occurrences" -> ((s, d) => {
      // Pass 1 (argmax) explodes shingles as before, over an eagerly
      // persisted tokenized corpus; pass 2 is now MAP-ONLY — each
      // doc's occurrence positions of the single top phrase fall out
      // of one array filter over its cached tokens, replacing the
      // former re-tokenize + re-explode + broadcast join + groupBy
      // (the per-doc grain already exists, so the explode-then-regroup
      // paid a corpus-sized shuffle for nothing — guide §2.4). Output
      // identical: n_occ = |matches|, first_pos = first match index
      // (filter preserves the ascending sequence order).
      val toks = table(s, d, "documents")
        .withColumn("t", words(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), col("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toks.count()
      val sh = toks.select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, size(t) - 3),
           i -> concat_ws(' ', slice(t, i + 1, 3)))"""))
        .as(Seq("pos", "shingle")))
      val top = sh.groupBy("shingle").agg(count(lit(1)).as("n_total"))
        .orderBy(col("n_total").desc, col("shingle")).limit(1)
        .select(col("shingle").as("phrase"), col("n_total"))
      toks.crossJoin(broadcast(top))
        .select(col("doc_id"), expr(
          """filter(sequence(0, size(t) - 3),
             i -> concat_ws(' ', slice(t, i + 1, 3)) = phrase)""")
          .as("hits"), col("n_total"))
        .filter(size(col("hits")) > 0)
        .select(col("doc_id"),
          size(col("hits")).cast("long").as("n_occ"),
          element_at(col("hits"), 1).cast("long").as("first_pos"),
          col("n_total"))
    }),

    // ---- q328: bitmap-index audience intersections ---------------------
    // Per (event_type, word) OR-folded user bitmaps — 62 users per
    // i64 word (63-bit shifts overflow portable SQL), so the bitmap
    // frame is |users|/62 rows per type and the pairwise intersection
    // is a word-aligned equi-join + popcount: exact distinct-user
    // overlap and Jaccard for every type pair with NO distinct
    // shuffle and NO user-level pair frame. The roaring-bitmap
    // workhorse, relationally.
    "q328_bitmap_intersections" -> ((s, d) => {
      val bm = table(s, d, "events")
        .select(col("event_type").as("et"),
          expr("user_id div 62").as("w"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT))")
            .as("bit"))
        .groupBy("et", "w").agg(expr("bit_or(bit)").as("bits"))
      val cnt = bm.groupBy("et")
        .agg(sum(expr("bit_count(bits)")).cast("long").as("c"))
      val inter = bm.select(col("et").as("type_a"), col("w"),
          col("bits").as("ba"))
        .join(bm.select(col("et").as("type_b"), col("w"),
          col("bits").as("bb")), "w")
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(sum(expr("bit_count(ba & bb)")).cast("long").as("n_both"))
      inter
        .join(cnt.select(col("et").as("type_a"), col("c").as("n_a")),
          "type_a")
        .join(cnt.select(col("et").as("type_b"), col("c").as("n_b")),
          "type_b")
        .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"),
          col("n_b"),
          expr("n_both * 1000000 div (n_a + n_b - n_both)")
            .as("jaccard_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q327_phrase_occurrences" ->
      """WITH toks AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '')
               AS t
           FROM documents),
         sh AS (
           SELECT doc_id, i AS pos,
             t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS shingle
           FROM (SELECT doc_id, t, unnest(range(0, len(t) - 2)) AS i
                 FROM toks WHERE len(t) >= 3)),
         top AS (
           SELECT shingle AS phrase, count(*) AS n_total
           FROM sh GROUP BY 1
           ORDER BY n_total DESC, phrase LIMIT 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(min(pos) AS BIGINT) AS first_pos,
           CAST(max(n_total) AS BIGINT) AS n_total
         FROM sh JOIN top ON sh.shingle = top.phrase
         GROUP BY doc_id""",

    "q328_bitmap_intersections" ->
      """WITH bm AS (
           SELECT event_type AS et, user_id // 62 AS w,
             bit_or(1::BIGINT << CAST(user_id % 62 AS INTEGER)) AS bits
           FROM events GROUP BY 1, 2),
         cnt AS (
           SELECT et, CAST(sum(bit_count(bits)) AS BIGINT) AS c
           FROM bm GROUP BY 1),
         inter AS (
           SELECT a.et AS type_a, b.et AS type_b,
             CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS n_both
           FROM bm a JOIN bm b ON a.w = b.w AND a.et < b.et
           GROUP BY 1, 2)
         SELECT type_a, type_b, n_both,
           ca.c AS n_a, cb.c AS n_b,
           CAST(n_both * 1000000 // (ca.c + cb.c - n_both) AS BIGINT)
             AS jaccard_ppm
         FROM inter
         JOIN cnt ca ON inter.type_a = ca.et
         JOIN cnt cb ON inter.type_b = cb.et""")
}
