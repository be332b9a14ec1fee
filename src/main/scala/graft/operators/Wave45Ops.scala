package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 45: feature-interaction and vocabulary-design audits.
  *
  *   - q275 pointwise-mutual-information profile between event type
  *     and hour-of-day — the feature-interaction screen (are these
  *     two columns independent?), in q99's integer micro-nats.
  *   - q276 vocabulary coverage curve: what fraction of token
  *     occurrences the top-k vocabulary covers, at standard k cuts —
  *     the tokenizer-vocab-size design table.
  */
object Wave45Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Log-spaced cuts; the synthetic corpus has a 31-token vocabulary,
    * so the upper cuts legitimately emit no row (both engines drop
    * them) while the curve is still read at 5 points. */
  private val VocabCuts = Seq(1L, 3L, 10L, 30L, 100L, 300L)

  val queries: Map[String, Q] = Map(
    // ---- q275: PMI profile (type × hour) -------------------------------
    // One (type, hour) cell rollup plus the two broadcast marginals;
    // pmi_micro = floor(ln(N·n_ij/(n_i·n_j))·1e6) — the same
    // floored-double-log discipline as q99, so the per-cell values
    // are engine-exact integers and contrib sums exactly. Cells with
    // pmi far from 0 flag dependence a feature-crossing (or leakage
    // check) should know about. N·n_ij stays in DOUBLE for the ratio,
    // never in long products.
    "q275_pmi_cells" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_type"),
          expr("(ts div 3600000000000) % 24").as("hour"))
      val cells = ev.groupBy("event_type", "hour")
        .agg(count(lit(1)).as("n_ij"))
      val mType = ev.groupBy("event_type").agg(count(lit(1)).as("n_i"))
      val mHour = ev.groupBy("hour").agg(count(lit(1)).as("n_j"))
      val tot = ev.agg(count(lit(1)).as("n_tot"))
      cells
        .join(broadcast(mType), "event_type")
        .join(broadcast(mHour), "hour")
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("hour"), col("n_ij"),
          floor(log(
            (col("n_tot").cast("double") * col("n_ij").cast("double")) /
              (col("n_i").cast("double") * col("n_j").cast("double")))
            * 1e6).cast("long").as("pmi_micro"))
        .withColumn("contrib_micro", col("n_ij") * col("pmi_micro"))
    }),

    // ---- q276: vocabulary coverage curve -------------------------------
    // Vocab counts (one map-side-combined shuffle), ranked descending
    // with a token tie-break, occurrence-cumulative over the
    // vocabulary-sized frame (same domain-bounded single-partition
    // class as q236's Zipf audit; the two-phase distributed rank —
    // q93 — replaces it at real vocabulary sizes), then the curve is
    // read off at the standard k cuts. Cuts beyond the vocabulary
    // emit no row in either engine.
    "q276_vocab_coverage" -> ((s, d) => {
      val toks = table(s, d, "documents")
        .select(explode(filter(split(lower(col("text")), " "),
          w => w =!= "")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = toks.agg(count(lit(1)).as("n_total"))
      val w = Window.orderBy(col("cnt").desc, col("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vocab
        .withColumn("rn", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
        .withColumn("cum", sum("cnt").over(w))
        .filter(col("rn").isin(VocabCuts: _*))
        .crossJoin(broadcast(tot))
        .select(col("rn").as("vocab_k"), col("cum").as("n_covered"),
          col("n_total"),
          expr("cum * 1000000 div n_total").as("coverage_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q275_pmi_cells" ->
      """WITH ev AS (
           SELECT event_type, (epoch_ns(ts) // 3600000000000) % 24 AS hour
           FROM events),
         cells AS (SELECT event_type, hour, count(*) AS n_ij
                   FROM ev GROUP BY 1, 2),
         mt AS (SELECT event_type, count(*) AS n_i FROM ev GROUP BY 1),
         mh AS (SELECT hour, count(*) AS n_j FROM ev GROUP BY 1),
         tot AS (SELECT count(*) AS n_tot FROM ev)
         SELECT event_type, hour, n_ij,
           CAST(floor(ln((CAST(n_tot AS DOUBLE) * n_ij)
             / (CAST(n_i AS DOUBLE) * n_j)) * 1e6) AS BIGINT) AS pmi_micro,
           n_ij * CAST(floor(ln((CAST(n_tot AS DOUBLE) * n_ij)
             / (CAST(n_i AS DOUBLE) * n_j)) * 1e6) AS BIGINT)
             AS contrib_micro
         FROM cells
         JOIN mt USING (event_type) JOIN mh USING (hour)
         CROSS JOIN tot""",

    "q276_vocab_coverage" ->
      """WITH toks AS (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
             w -> w <> '')) AS tok
           FROM documents),
         vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         tot AS (SELECT count(*) AS n_total FROM toks),
         ranked AS (
           SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rn,
             CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM vocab)
         SELECT CAST(rn AS BIGINT) AS vocab_k, cum AS n_covered, n_total,
           cum * 1000000 // n_total AS coverage_ppm
         FROM ranked CROSS JOIN tot
         WHERE rn IN (1, 3, 10, 30, 100, 300)""")
}
