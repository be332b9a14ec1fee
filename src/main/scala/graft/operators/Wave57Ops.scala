package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 57: topic segmentation and robust trend estimation.
  *
  *   - q302 TextTiling-style topic segmentation (Hearst 1997, the
  *     integer-exact variant): lexical cohesion between adjacent
  *     20-token blocks as distinct-token Jaccard; a cohesion dip below
  *     half the document's mean marks a topic boundary — the chunking
  *     signal a RAG pipeline wants instead of fixed windows (q94).
  *   - q303 Theil–Sen slope: the median of all pairwise day slopes of
  *     each event type's daily revenue — the robust trend that one
  *     outlier day cannot move, next to q176's least-squares slope.
  *     Day counts bound the pair work (C(days,2) per type), so the
  *     "quadratic" stage is constant-sized at ANY corpus scale.
  */
object Wave57Ops {

  type Q = (SparkSession, String) => DataFrame

  private val NsPerDay = 86400000000000L

  /** Floor division for possibly-negative numerators (b > 0). NB: both
    * Spark `div` and DuckDB integer `//` truncate toward zero (verified
    * round 6), so the two dialects already agree with each other — this
    * remainder-shifted form is used where FLOOR (not truncate) semantics
    * are wanted on signed values, and it evaluates identically in both
    * engines because it is pure integer +/%/div arithmetic. */
  private def floorDiv(a: String, b: String): String =
    s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) div ($b)"

  val queries: Map[String, Q] = Map(
    // ---- q302: lexical-cohesion topic segmentation ---------------------
    // Tokens gain positions map-side (posexplode), blocks are
    // pos div 20, and cohesion is the distinct-token Jaccard between
    // block b and b+1 — computed candidate-style: one (doc, block,
    // token) distinct frame, self-joined at block+1 on (doc, token)
    // for intersections (work bounded by shared tokens, the posting
    // shape), sizes from the same frame. Boundary: jac < mean/2 of
    // the doc's own seams (integer-exact: 2·n·jac < Σjac). Output is
    // one summary row per document. Scales as the token scan + a
    // (doc, block)-keyed shuffle; no corpus-wide window anywhere.
    "q302_texttiling_segmentation" -> ((s, d) => {
      val toks = table(s, d, "documents")
        .select(col("doc_id"),
          posexplode(expr(
            "filter(split(lower(text), ' '), w -> w != '')"))
            .as(Seq("pos", "tok")))
        .select(col("doc_id"), expr("pos div 20").as("blk"), col("tok"))
        .distinct()
      val sizes = toks.groupBy("doc_id", "blk")
        .agg(count(lit(1)).as("sz"))
      val inter = toks
        .join(toks.select(col("doc_id"), (col("blk") - 1).as("blk"),
          col("tok").as("tok2")),
          Seq("doc_id", "blk"))
        .filter(col("tok") === col("tok2"))
        .groupBy("doc_id", "blk").agg(count(lit(1)).as("inter"))
      val seams = sizes
        .join(sizes.select(col("doc_id"), (col("blk") - 1).as("blk"),
          col("sz").as("sz_next")), Seq("doc_id", "blk"))
        .join(inter, Seq("doc_id", "blk"), "left_outer")
        .na.fill(0L, Seq("inter"))
        .withColumn("jac_ppm",
          expr("inter * 1000000 div (sz + sz_next - inter)"))
      seams.groupBy("doc_id")
        .agg(count(lit(1)).as("n_seams"), sum("jac_ppm").as("sum_jac"),
          min("jac_ppm").as("min_jac_ppm"))
        .join(seams.select("doc_id", "blk", "jac_ppm"), "doc_id")
        .withColumn("is_boundary",
          expr("2 * n_seams * jac_ppm < sum_jac"))
        .groupBy("doc_id")
        .agg(max("n_seams").as("n_seams"),
          sum(when(col("is_boundary"), 1L).otherwise(0L))
            .as("n_boundaries"),
          max("min_jac_ppm").as("min_jac_ppm"),
          expr("max(sum_jac) div max(n_seams)").as("mean_jac_ppm"))
    }),

    // ---- q303: Theil–Sen robust trend per event type -------------------
    // Daily revenue series per type (the corpus pass), then ALL day
    // pairs d1<d2 within each type — a self-join on the DAY-DOMAIN
    // frame, C(days,2) rows per type regardless of corpus size. Slope
    // = floor-div((r2−r1)·1e6, d2−d1) with the portable floor form
    // (slopes go negative; div-vs-// would diverge). The median is
    // the ⌈n/2⌉-th smallest by (slope, d1, d2) rank — fully
    // deterministic ties.
    "q303_theil_sen_trend" -> ((s, d) => {
      val daily = table(s, d, "events")
        .groupBy(col("event_type"),
          expr(s"ts div $NsPerDay").as("day"))
        .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("rev"))
      val a = daily.select(col("event_type"), col("day").as("d1"),
        col("rev").as("r1"))
      val b = daily.select(col("event_type"), col("day").as("d2"),
        col("rev").as("r2"))
      val pairs = a.join(b, Seq("event_type"))
        .filter(col("d1") < col("d2"))
        .withColumn("slope_micro",
          expr(floorDiv("(r2 - r1) * 1000000", "d2 - d1")))
      val w = Window.partitionBy("event_type")
        .orderBy(col("slope_micro"), col("d1"), col("d2"))
      pairs.withColumn("rn", row_number().over(w))
        .withColumn("n_pairs",
          count(lit(1)).over(Window.partitionBy("event_type")))
        .filter(col("rn") === expr("(n_pairs + 1) div 2"))
        .select(col("event_type"), col("n_pairs").cast("long")
          .as("n_pairs"), col("slope_micro")
          .as("median_slope_micro"))
    }))

  val oracle: Map[String, String] = Map(
    "q302_texttiling_segmentation" ->
      """WITH toks AS (
           SELECT DISTINCT doc_id, (pos - 1) // 20 AS blk, tok FROM (
             SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                 w -> w <> '')) AS tok,
               unnest(range(1, len(list_filter(
                 string_split(lower(text), ' '), w -> w <> '')) + 1))
                 AS pos
             FROM documents)),
         sizes AS (
           SELECT doc_id, blk, count(*) AS sz
           FROM toks GROUP BY 1, 2),
         inter AS (
           SELECT a.doc_id, a.blk, count(*) AS inter
           FROM toks a JOIN toks b
             ON a.doc_id = b.doc_id AND b.blk = a.blk + 1
             AND a.tok = b.tok
           GROUP BY 1, 2),
         seams AS (
           SELECT s1.doc_id, s1.blk,
             coalesce(i.inter, 0) * 1000000
               // (s1.sz + s2.sz - coalesce(i.inter, 0)) AS jac_ppm
           FROM sizes s1
           JOIN sizes s2 ON s1.doc_id = s2.doc_id
             AND s2.blk = s1.blk + 1
           LEFT JOIN inter i ON s1.doc_id = i.doc_id
             AND s1.blk = i.blk),
         agg AS (
           SELECT doc_id, count(*) AS n_seams, sum(jac_ppm) AS sum_jac,
                  min(jac_ppm) AS min_jac_ppm
           FROM seams GROUP BY 1)
         SELECT a.doc_id, CAST(a.n_seams AS BIGINT) AS n_seams,
           CAST(sum(CASE WHEN 2 * a.n_seams * s.jac_ppm < a.sum_jac
             THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
           CAST(a.min_jac_ppm AS BIGINT) AS min_jac_ppm,
           CAST(a.sum_jac // a.n_seams AS BIGINT) AS mean_jac_ppm
         FROM agg a JOIN seams s ON a.doc_id = s.doc_id
         GROUP BY a.doc_id, a.n_seams, a.min_jac_ppm, a.sum_jac""",

    "q303_theil_sen_trend" ->
      """WITH daily AS (
           SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
                  sum(CAST(floor(value * 100) AS BIGINT)) AS rev
           FROM events GROUP BY 1, 2),
         pairs AS (
           SELECT a.event_type, a.day AS d1, b.day AS d2,
             ((b.rev - a.rev) * 1000000
              - ((((b.rev - a.rev) * 1000000) % (b.day - a.day))
                 + (b.day - a.day)) % (b.day - a.day))
               // (b.day - a.day) AS slope_micro
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day),
         ranked AS (
           SELECT event_type, slope_micro,
             row_number() OVER (PARTITION BY event_type
               ORDER BY slope_micro, d1, d2) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_pairs
           FROM pairs)
         SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(slope_micro AS BIGINT) AS median_slope_micro
         FROM ranked WHERE rn = (n_pairs + 1) // 2""")
}
