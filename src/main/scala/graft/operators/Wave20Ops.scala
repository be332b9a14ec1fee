package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 20: bounded-state frequency sketching, sequence-model
  * prep, data discovery, and chunk-level dedup.
  *
  *   - q220 Misra–Gries heavy hitters: single-pass bounded-state
  *     candidate generation (a mergeable `Aggregator`) composed with
  *     an exact verify of just the candidates — exact output, O(k)
  *     shuffle bytes per partition for the full-universe pass.
  *   - q221 event-transition (Markov) matrix: per-user next-event
  *     bigram counts and per-source-state transition ppm — the
  *     sufficient statistic a next-event model trains on.
  *   - q222 joinable-column discovery: exact value-set containment
  *     across the schema's key columns (the Josie-style exact
  *     baseline), with per-value posting lists bounded by the number
  *     of profiled columns.
  *   - q223 content-defined chunking dedup: stateless rolling-window
  *     boundary predicate (hash of a 4-char window ≡ 0 mod 37) splits
  *     each document into content-defined chunks, then chunk-level
  *     duplication stats — insertions/deletions shift byte offsets but
  *     not chunk identity, the property fixed-size blocking lacks.
  */
object Wave20Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Whitespace tokens of the document corpus, lowercased. */
  private def tokens(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(explode(
        filter(split(lower(col("text")), " "), w => length(w) > 0))
        .as("token"))

  /** The schema's key columns, profiled for q222. */
  private val ProfiledCols: Seq[(String, String)] = Seq(
    "customer" -> "c_custkey", "orders" -> "o_custkey",
    "orders" -> "o_orderkey", "lineitem" -> "l_orderkey",
    "supplier" -> "s_suppkey", "lineitem" -> "l_suppkey",
    "part" -> "p_partkey", "lineitem" -> "l_partkey",
    "nation" -> "n_nationkey", "customer" -> "c_nationkey",
    "supplier" -> "s_nationkey")

  val queries: Map[String, Q] = Map(
    // ---- q220: Misra–Gries heavy hitters (candidates + exact verify) ----
    // The two-phase shape a corpus-scale frequency query should take:
    // phase 1 streams every token through the mergeable MG summary
    // (state ≤ k entries per partition, O(k) bytes shuffled — never a
    // token-universe-sized hash table); phase 2 exactly counts ONLY
    // the ≤ k candidates via a broadcast semi-join. MG's deficit
    // guarantee (undercount ≤ n/(k+1), k=199) means every token with
    // true frequency > n/200 is a candidate, so the final filter
    // `cnt · 200 > n` yields EXACTLY the oracle's full groupBy answer.
    // MisraGriesSpec property-tests the guarantee under random merge
    // splits; this gate catches any candidate the sketch ever drops.
    "q220_mg_heavy_hitters" -> ((s, d) => {
      val toks = tokens(s, d)
      val mg = udaf(new graft.functions.MisraGries(199))
      val cands = toks.agg(mg(col("token")).as("summary"))
        .select(explode(map_keys(col("summary"))).as("token"))
      val tot = toks.agg(count(lit(1)).as("n_total"))
      toks.join(broadcast(cands), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter(col("cnt") * 200 > col("n_total"))
        .select(col("token"), col("cnt"), col("n_total"))
    }),

    // ---- q221: event-transition (Markov) matrix ------------------------
    // Per-user event sequences (ordered by canonical ns time with
    // event_id as the unique tie-break) → next-event bigram counts →
    // per-source-state transition probability in integer ppm. One
    // user-keyed window shuffle + one (state, next) aggregation; the
    // ppm normalization windows over ≤ |event_type|² rows. The
    // transition matrix is tiny at any corpus size — the cost is the
    // one pass over events, which is the floor.
    "q221_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("ppm",
          expr("n * 1000000L div sum(n) over (partition by event_type)"))
    }),

    // ---- q222: joinable-column discovery (value-set containment) -------
    // Which key columns join against which: distinct value sets per
    // profiled column (map-side combined), one equi-join on the value,
    // and containment = |A∩B| / min(|A|,|B|) in integer ppm. Every
    // value's posting list is bounded by the number of profiled
    // columns (11 here), so the pair stage emits ≤ 55 rows per value —
    // never all-pairs on rows. At a lakehouse's column count the exact
    // join gives way to per-column KMV sketches (q60's aggregator)
    // with the same downstream shape; this is the exact baseline a
    // sketch variant is validated against.
    "q222_joinable_columns" -> ((s, d) => {
      // ONE scan per table (its profiled columns stacked map-side into
      // (cid, v) pairs) + ONE global distinct shuffle — measured
      // 2.9 → 2.3 s vs the original per-column-distinct formulation,
      // which planned 11 separate scan+distinct stages before the
      // union; at lakehouse column counts the stage-count saving is
      // the difference between O(columns) and O(tables) scheduling.
      // The heavy phase carries a small INT column id, not the
      // "table.column" string — the label was ~20 bytes on every one of
      // the fact-sized stacked rows and dominated the distinct
      // exchange (measured 17.8 → 11.5 s at sf1); ids are assigned in
      // sorted-name order so cid_a < cid_b ≡ col_a < col_b and names
      // come back from an 11-row broadcast at the end. Same output
      // set: distinct over stacked pairs ≡ union of per-column
      // distincts.
      import s.implicits._
      val sortedNames = ProfiledCols.map { case (t, c) => s"$t.$c" }.sorted
      val cid = sortedNames.zipWithIndex.toMap
      val vals = ProfiledCols.groupBy(_._1).toSeq.map { case (t, tc) =>
        table(s, d, t).select(explode(array(tc.map { case (_, c) =>
          struct(lit(cid(s"$t.$c")).as("cid"),
            col(c).cast("long").as("v"))
        }: _*)).as("p")).select(col("p.cid"), col("p.v"))
      }.reduce(_ unionByName _).distinct()
      // NOT persisted: ReuseExchange already shares the distinct's
      // shuffle across the 3 consumers; an explicit persist measured
      // SLOWER (2.3 → 2.8 s) — the cache write outweighs the reuse.
      // Size + name ride ONE 11-row broadcast per pair side (r11): the
      // former four broadcast joins (sizes ×2, names ×2) each paid a
      // broadcast-build job + join stage on a ≤55-row frame — pure
      // job-count floor (guide §1.2 step 1). Same lookup values.
      val sizes = vals.groupBy("cid").agg(count(lit(1)).as("n"))
      val names = sortedNames.zipWithIndex
        .map { case (n, i) => (i, n) }.toDF("cid", "col_name")
      val meta = sizes.join(names, "cid")
      val a = vals.select(col("cid").as("cid_a"), col("v"))
      val b = vals.select(col("cid").as("cid_b"), col("v"))
      a.join(b, "v").filter(col("cid_a") < col("cid_b"))
        .groupBy("cid_a", "cid_b").agg(count(lit(1)).as("n_inter"))
        .join(broadcast(meta.select(col("cid").as("cid_a"),
          col("n").as("n_a"), col("col_name").as("col_a"))), "cid_a")
        .join(broadcast(meta.select(col("cid").as("cid_b"),
          col("n").as("n_b"), col("col_name").as("col_b"))), "cid_b")
        .select(col("col_a"), col("col_b"), col("n_a"), col("n_b"),
          col("n_inter"),
          expr("n_inter * 1000000L div least(n_a, n_b)")
            .as("containment_ppm"))
    }),

    // ---- q223: content-defined chunking dedup --------------------------
    // Restic/LBFS-style chunking with a STATELESS boundary predicate
    // (md5 of the 4-char window at position i ≡ 0 mod 37 ⇒ expected
    // chunk ≈ 37 chars): chunk identity depends only on local content,
    // so shared runs between near-duplicate documents land in
    // identical chunks regardless of offset shifts. Everything up to
    // the final chunk rollup is per-row array lambdas — zero shuffle
    // until the (chunk)-keyed count, which map-side combines. Output:
    // every chunk appearing ≥ 2 times with its duplication stats (the
    // input to a chunk-store sizing / dedup-ratio decision).
    "q223_cdc_chunks" -> ((s, d) => {
      // cdc_chunks is the native kernel for the former relational cut
      // expression (array_sort/filter/sequence over md5'd 4-char
      // windows) — byte-identical chunks, one pass over the document
      // bytes, zero per-window allocation (see CdcChunks.scala, which
      // embeds the replaced SQL verbatim; CdcChunksSpec pins
      // equivalence against that SQL form on mixed ASCII/non-ASCII).
      table(s, d, "documents")
        .select(col("doc_id"),
          explode(expr("cdc_chunks(text)")).as("chunk"))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_occ") >= 2)
        .select(md5(col("chunk")).as("chunk_hash"),
          length(col("chunk")).cast("long").as("chunk_len"),
          col("n_occ"), col("n_docs"))
    }))

  private val valsSql: String = ProfiledCols.map { case (t, c) =>
    s"SELECT DISTINCT '$t.$c' AS col_name, CAST($c AS BIGINT) AS v FROM $t"
  }.mkString("\n           UNION ALL ")

  val oracle: Map[String, String] = Map(
    "q220_mg_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
                    w -> w <> '')) AS token
           FROM documents),
         tot AS (SELECT count(*) AS n_total FROM toks)
         SELECT token, CAST(count(*) AS BIGINT) AS cnt,
                (SELECT n_total FROM tot) AS n_total
         FROM toks GROUP BY token
         HAVING count(*) * 200 > (SELECT n_total FROM tot)""",
    "q221_event_transitions" ->
      """WITH seq AS (
           SELECT event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY epoch_ns(ts), event_id) AS next_type
           FROM events),
         trans AS (
           SELECT event_type, next_type, count(*) AS n
           FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
         SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
                CAST(n * 1000000
                     // sum(n) OVER (PARTITION BY event_type)
                  AS BIGINT) AS ppm
         FROM trans""",
    "q222_joinable_columns" ->
      s"""WITH vals AS (
           $valsSql),
         sizes AS (SELECT col_name, count(*) AS n FROM vals GROUP BY 1),
         inter AS (
           SELECT a.col_name AS col_a, b.col_name AS col_b,
                  count(*) AS n_inter
           FROM vals a JOIN vals b
             ON a.v = b.v AND a.col_name < b.col_name
           GROUP BY 1, 2)
         SELECT col_a, col_b, CAST(sa.n AS BIGINT) AS n_a,
                CAST(sb.n AS BIGINT) AS n_b,
                CAST(n_inter AS BIGINT) AS n_inter,
                CAST(n_inter * 1000000 // least(sa.n, sb.n) AS BIGINT)
                  AS containment_ppm
         FROM inter JOIN sizes sa ON sa.col_name = col_a
                    JOIN sizes sb ON sb.col_name = col_b""",
    "q223_cdc_chunks" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS len FROM documents),
         c AS (
           SELECT doc_id, text, len,
                  list_sort(list_concat([1],
                    list_filter(range(2, greatest(2, len - 2)),
                      i -> CAST(('0x' || substr(md5(substr(text, i, 4)),
                                 1, 4)) AS BIGINT) % 37 = 0))) AS cuts
           FROM d),
         ch AS (
           SELECT doc_id,
                  unnest(list_transform(range(1, len(cuts) + 1),
                    j -> substr(text, cuts[j],
                           coalesce(cuts[j + 1], len + 1) - cuts[j])))
                    AS chunk
           FROM c)
         SELECT md5(chunk) AS chunk_hash,
                CAST(length(chunk) AS BIGINT) AS chunk_len,
                CAST(count(*) AS BIGINT) AS n_occ,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         FROM ch GROUP BY chunk HAVING count(*) >= 2""")
}
