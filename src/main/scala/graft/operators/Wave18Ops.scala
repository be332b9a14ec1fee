package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 18: document-quality repetition gates and lakehouse
  * maintenance planning.
  *
  *   - q210 Gopher-style repetition signals (Rae et al. 2021, Table A1,
  *     adapted to the single-line corpus): top-2-gram character share,
  *     most-common-word share, duplicate-segment share — per doc, exact
  *     integer ppm, with the composite keep flag a quality gate applies.
  *   - q211 WITHIN-doc segment dedup + recompose (the complement of
  *     q196's cross-corpus keep-first): repeated segments inside one
  *     document are dropped and the text reassembled in order.
  *   - q212 robust outlier gate per source: banded lower-median + MAD
  *     (median absolute deviation) over the value-domain histogram —
  *     never a per-group sort of the corpus.
  *   - q213 small-file compaction planner: files binned to a target
  *     size by the distributed exclusive prefix sum — the OPTIMIZE /
  *     rewrite-data-files planning pass of a lakehouse table.
  *   - q214 optimistic-concurrency conflict audit: which commits saw a
  *     concurrent commit land on their partition inside their snapshot
  *     window (first-committer-wins serializability check) — interval
  *     predicate turned into a day-slab EQUI-join, never all-pairs.
  */
object Wave18Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Whitespace tokens, empties dropped — corpus-wide convention shared
    * with TextOps/Wave15Ops so oracles line up. */
  private def words(c: Column): Column =
    filter(split(lower(c), " "), w => length(w) > 0)

  /** Segment length (tokens) for the repetition signals (q210/q211) —
    * 3 on this short-doc corpus (real prose uses line/paragraph
    * boundaries); docs shorter than MinToks are below the gate. */
  private val SegLen = 3
  private val MinToks = 10

  private val segsExpr =
    s"""transform(sequence(0, int(ceil(size(t) / $SegLen.0)) - 1),
        i -> array_join(slice(t, i * $SegLen + 1, $SegLen), ' '))"""

  val queries: Map[String, Q] = Map(
    // ---- q210: Gopher repetition signals -------------------------------
    // Three repetition measures per doc, each from its own map-side-
    // combined (doc, unit) rollup — the shuffles carry bounded count
    // partials, never text beyond the unit strings:
    //   top2gram_ppm  chars covered by the most frequent adjacent 2-gram
    //                 (count × gram length, standard overlap-counting)
    //                 per document character,
    //   topword_ppm   occurrences of the most common token per token,
    //   dupseg_ppm    repeat occurrences of 3-token segments per segment.
    // Ties on the argmax resolve by the LEXICOGRAPHICALLY larger unit via
    // max(struct(cnt, unit)) — deterministic and engine-portable (DuckDB
    // compares structs field-by-field the same way). The keep flag is the
    // composite gate a Gopher-rules filter applies; thresholds sit where
    // the synthetic corpus genuinely splits.
    "q210_gopher_repetition" -> ((s, d) => {
      val base = table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"), words(col("text")).as("t"))
        .withColumn("n_toks", size(col("t")).cast("long"))
        .filter(col("n_toks") >= MinToks)
      val topG = base.select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(t) - 2),
             i -> array_join(slice(t, i + 1, 2), ' '))""")).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(max(struct(col("cnt"), col("gram"))).as("m"))
        .select(col("doc_id"),
          (col("m.cnt") * length(col("m.gram"))).as("g_chars"))
      val topW = base.select(col("doc_id"), explode(col("t")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(max(struct(col("cnt"), col("w"))).as("m"))
        .select(col("doc_id"), col("m.cnt").as("w_cnt"))
      val segs = base.select(col("doc_id"), explode(expr(segsExpr)).as("seg"))
        .groupBy("doc_id", "seg").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(sum("cnt").as("n_segs"),
          sum(col("cnt") - 1).as("dup_segs"))
      base.select("doc_id", "n_chars", "n_toks")
        .join(topG, "doc_id").join(topW, "doc_id").join(segs, "doc_id")
        .select(col("doc_id"),
          expr("g_chars * 1000000 div n_chars").as("top2gram_ppm"),
          expr("w_cnt * 1000000 div n_toks").as("topword_ppm"),
          expr("dup_segs * 1000000 div n_segs").as("dupseg_ppm"))
        .withColumn("keep",
          when(col("top2gram_ppm") <= 100000 &&
            col("topword_ppm") <= 110000 &&
            col("dupseg_ppm") === 0, 1L).otherwise(0L))
    }),

    // ---- q211: within-doc segment dedup + recompose --------------------
    // Keep the FIRST occurrence of each distinct 3-token segment inside
    // each document and reassemble the survivors in segment order — the
    // within-doc half of Gopher's duplicate-line removal (q196 is the
    // cross-corpus half). One window shuffle keyed (doc_id, seg); the
    // recompose is an ordered array fold per doc (collect_list is
    // unordered, array_sort on the (seg_idx, seg) struct restores the
    // total order — seg_idx is unique per doc so the sort is
    // deterministic). Per-doc state is the document itself: no stage
    // ever holds more than one doc's segments in a row.
    "q211_withindoc_dedup" -> ((s, d) => {
      val segs = table(s, d, "documents")
        .select(col("doc_id"), words(col("text")).as("t"))
        .filter(size(col("t")) > 0)
        .select(col("doc_id"), posexplode(expr(segsExpr)))
        .toDF("doc_id", "seg_idx", "seg")
      val firstIdx = Window.partitionBy("doc_id", "seg").orderBy("seg_idx")
      segs.withColumn("rn", row_number().over(firstIdx))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          concat_ws(" ", expr(
            """transform(
                 array_sort(collect_list(
                   CASE WHEN rn = 1 THEN struct(seg_idx, seg) END)),
                 x -> x.seg)""")).as("text_dedup"))
    }),

    // ---- q212: banded median + MAD robust outlier gate ------------------
    // Per-source robust center/spread without ever sorting the corpus:
    // n_chars is banded (div 10) onto a bounded value domain, the lower
    // median comes from the per-(source, band) HISTOGRAM via a running
    // sum whose window frame is |domain|-bounded (q181's machinery,
    // grouped), and MAD repeats the same trick on |band − median|.
    // Outliers = docs beyond 3 MAD bands. Median/MAD are the robust
    // replacements for the mean/σ gate (q144): one mega-doc cannot drag
    // the threshold. All shuffles key on source (+band); the two
    // median frames are |sources|·|bands| rows — broadcastable at any
    // corpus size.
    "q212_mad_outliers" -> ((s, d) => {
      val banded = table(s, d, "documents")
        .select(col("source"), expr("n_chars div 10").as("band"))
      def lowerMedian(df: DataFrame, valueCol: String, out: String)
          : DataFrame = {
        val hist = df.groupBy("source", valueCol)
          .agg(count(lit(1)).as("cnt"))
        val n = hist.groupBy("source").agg(sum("cnt").as("n"))
        val run = Window.partitionBy("source").orderBy(valueCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist.withColumn("run", sum("cnt").over(run))
          .join(n, "source")
          .filter(col("run") >= expr("(n + 1) div 2"))
          .groupBy("source").agg(min(valueCol).as(out))
      }
      val med = lowerMedian(banded, "band", "med_band")
      val dev = banded.join(med, "source")
        .select(col("source"), col("band"), col("med_band"),
          abs(col("band") - col("med_band")).as("dev"))
      val mad = lowerMedian(dev.select("source", "dev"), "dev", "mad_band")
      dev.join(mad, "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          min("med_band").as("med_band"),
          min("mad_band").as("mad_band"),
          sum(when(col("dev") > col("mad_band") * 3, 1L).otherwise(0L))
            .as("n_outliers"))
    }),

    // ---- q213: small-file compaction planner ---------------------------
    // The OPTIMIZE planning pass: pack the table's files (stand-in: one
    // doc = one file of n_chars bytes) in key order into ~4000-byte
    // output bins. A file's bin is where its FIRST byte lands in the
    // exclusive running total — next-fit packing, deterministic, and
    // expressible as one distributed prefix sum (orderedCumsum: range
    // partition + local window + broadcast offsets — no single-partition
    // window over the file listing, which at 100 TB is itself millions
    // of rows). Output is the per-bin manifest a rewrite job consumes.
    "q213_compaction_plan" -> ((s, d) => {
      val files = table(s, d, "documents")
        .select(col("doc_id"), col("n_chars").as("bytes"))
      TextOps.orderedCumsum(files, Seq("doc_id"), "bytes", "cum")
        .withColumn("bin", expr("(cum - bytes) div 4000"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("bytes_total"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    }),

    // ---- q214: optimistic-concurrency conflict audit --------------------
    // Snapshot-isolation check over a commit log (stand-in: every 10th
    // order is a commit; partition = orderkey % 8, snapshot window =
    // [orderdate, orderdate + (totalprice mod 7 days) seconds]): a
    // commit CONFLICTS if another writer's commit landed on the same
    // partition strictly inside its window — the first-committer-wins
    // rule a lakehouse table enforces at commit time. The interval
    // predicate becomes an EQUI-join: each window explodes to its
    // covering day slabs (≤ 8, windows are < 7 days), the probe side
    // maps to the single slab of its commit instant, so each qualifying
    // pair meets on exactly one (partition, slab) key — never an
    // all-pairs comparison per partition. Output: per-partition
    // commit/conflict totals.
    "q214_occ_conflicts" -> ((s, d) => {
      val commits = table(s, d, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("ck"),
          (col("o_orderkey") % 8).as("part"),
          expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 1000")
            .as("start_sec"),
          (expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 1000") +
            expr("CAST(floor(o_totalprice) AS BIGINT)") % 604800)
            .as("commit_sec"))
      val windows = commits.select(col("ck"), col("part"),
          col("start_sec"), col("commit_sec"),
          explode(sequence(expr("start_sec div 86400"),
            expr("commit_sec div 86400"))).as("slab"))
      val others = commits.select(col("ck").as("o_ck"),
          col("part"), col("commit_sec").as("o_commit"),
          expr("commit_sec div 86400").as("slab"))
      windows.join(others, Seq("part", "slab"))
        .filter(col("o_ck") =!= col("ck") &&
          col("o_commit") > col("start_sec") &&
          col("o_commit") <= col("commit_sec"))
        .groupBy("ck", "part").agg(countDistinct("o_ck").as("n_concurrent"))
        .groupBy("part")
        .agg(count(lit(1)).as("n_conflicted"),
          sum("n_concurrent").as("total_conflicts"),
          max("n_concurrent").as("max_conflicts"))
    }))

  val oracle: Map[String, String] = Map(
    "q210_gopher_repetition" ->
      """WITH base AS (
           SELECT doc_id, n_chars,
                  list_filter(string_split(lower(text), ' '),
                              w -> w <> '') AS t
           FROM documents),
         b2 AS (
           SELECT doc_id, n_chars, t, CAST(len(t) AS BIGINT) AS n_toks
           FROM base WHERE len(t) >= 10),
         grams AS (
           SELECT doc_id,
                  array_to_string(t[i + 1 : i + 2], ' ') AS gram
           FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
                 FROM b2)),
         topg AS (
           SELECT doc_id,
                  max(struct_pack(cnt := cnt, gram := gram)) AS m
           FROM (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
                 FROM grams GROUP BY 1, 2)
           GROUP BY doc_id),
         topg2 AS (
           SELECT doc_id, m.cnt * length(m.gram) AS g_chars FROM topg),
         topw AS (
           SELECT doc_id, max(struct_pack(cnt := cnt, w := w)) AS m
           FROM (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt
                 FROM (SELECT doc_id, unnest(t) AS w FROM b2)
                 GROUP BY 1, 2)
           GROUP BY doc_id),
         segs AS (
           SELECT doc_id,
                  array_to_string(t[i * 3 + 1 : i * 3 + 3], ' ') AS seg
           FROM (SELECT doc_id, t,
                        unnest(range(CAST(ceil(len(t) / 3.0) AS BIGINT)))
                          AS i
                 FROM b2)),
         segstats AS (
           SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_segs,
                  CAST(sum(cnt - 1) AS BIGINT) AS dup_segs
           FROM (SELECT doc_id, seg, count(*) AS cnt
                 FROM segs GROUP BY 1, 2)
           GROUP BY doc_id)
         SELECT b2.doc_id,
                g_chars * 1000000 // n_chars AS top2gram_ppm,
                w_cnt * 1000000 // n_toks AS topword_ppm,
                dup_segs * 1000000 // n_segs AS dupseg_ppm,
                CASE WHEN g_chars * 1000000 // n_chars <= 100000
                      AND w_cnt * 1000000 // n_toks <= 110000
                      AND dup_segs = 0
                     THEN 1 ELSE 0 END AS keep
         FROM b2
         JOIN topg2 USING (doc_id)
         JOIN (SELECT doc_id, m.cnt AS w_cnt FROM topw) tw
           ON tw.doc_id = b2.doc_id
         JOIN segstats USING (doc_id)""",
    "q211_withindoc_dedup" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split(lower(text), ' '),
                              w -> w <> '') AS t
           FROM documents),
         segs AS (
           SELECT doc_id, i AS seg_idx,
                  array_to_string(t[i * 3 + 1 : i * 3 + 3], ' ') AS seg
           FROM (SELECT doc_id, t,
                        unnest(range(CAST(ceil(len(t) / 3.0) AS BIGINT)))
                          AS i
                 FROM toks WHERE len(t) > 0)),
         ranked AS (
           SELECT doc_id, seg_idx, seg,
                  row_number() OVER (PARTITION BY doc_id, seg
                                     ORDER BY seg_idx) AS rn
           FROM segs)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
                CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_kept,
                array_to_string(
                  list_transform(
                    list_sort(list(struct_pack(seg_idx := seg_idx,
                                               seg := seg))
                              FILTER (WHERE rn = 1)),
                    x -> x.seg), ' ') AS text_dedup
         FROM ranked GROUP BY doc_id""",
    "q212_mad_outliers" ->
      """WITH banded AS (
           SELECT source, n_chars // 10 AS band FROM documents),
         hist AS (
           SELECT source, band, count(*) AS cnt
           FROM banded GROUP BY 1, 2),
         n AS (SELECT source, sum(cnt) AS n FROM hist GROUP BY 1),
         med AS (
           SELECT source, min(band) AS med_band
           FROM (SELECT h.source, h.band,
                        sum(h.cnt) OVER (PARTITION BY h.source
                                         ORDER BY h.band
                                         ROWS UNBOUNDED PRECEDING) AS run,
                        n.n
                 FROM hist h JOIN n ON n.source = h.source)
           WHERE run >= (n + 1) // 2
           GROUP BY source),
         dev AS (
           SELECT b.source, abs(b.band - m.med_band) AS dev, m.med_band
           FROM banded b JOIN med m ON m.source = b.source),
         dhist AS (
           SELECT source, dev, count(*) AS cnt FROM dev GROUP BY 1, 2),
         mad AS (
           SELECT source, min(dev) AS mad_band
           FROM (SELECT h.source, h.dev,
                        sum(h.cnt) OVER (PARTITION BY h.source
                                         ORDER BY h.dev
                                         ROWS UNBOUNDED PRECEDING) AS run,
                        n.n
                 FROM dhist h JOIN n ON n.source = h.source)
           WHERE run >= (n + 1) // 2
           GROUP BY source)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(min(d.med_band) AS BIGINT) AS med_band,
                CAST(min(m.mad_band) AS BIGINT) AS mad_band,
                CAST(sum(CASE WHEN d.dev > m.mad_band * 3 THEN 1 ELSE 0
                         END) AS BIGINT) AS n_outliers
         FROM dev d JOIN mad m ON m.source = d.source
         GROUP BY d.source""",
    "q213_compaction_plan" ->
      """WITH cum AS (
           SELECT doc_id, n_chars AS bytes,
                  sum(n_chars) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
           FROM documents)
         SELECT CAST((cum - bytes) // 4000 AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_files,
                CAST(sum(bytes) AS BIGINT) AS bytes_total,
                CAST(min(doc_id) AS BIGINT) AS first_doc,
                CAST(max(doc_id) AS BIGINT) AS last_doc
         FROM cum GROUP BY 1""",
    "q214_occ_conflicts" ->
      """WITH commits AS (
           SELECT o_orderkey AS ck, o_orderkey % 8 AS part,
                  CAST(epoch(o_orderdate) AS BIGINT) AS start_sec,
                  CAST(epoch(o_orderdate) AS BIGINT)
                    + CAST(floor(o_totalprice) AS BIGINT) % 604800
                    AS commit_sec
           FROM orders WHERE o_orderkey % 10 = 0),
         pairs AS (
           SELECT a.ck, a.part, count(DISTINCT b.ck) AS n_concurrent
           FROM commits a JOIN commits b
             ON b.part = a.part AND b.ck <> a.ck
            AND b.commit_sec > a.start_sec
            AND b.commit_sec <= a.commit_sec
           GROUP BY a.ck, a.part)
         SELECT part, CAST(count(*) AS BIGINT) AS n_conflicted,
                CAST(sum(n_concurrent) AS BIGINT) AS total_conflicts,
                CAST(max(n_concurrent) AS BIGINT) AS max_conflicts
         FROM pairs GROUP BY part""")
}
