package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 25: sliced and ranked evaluation — the fairness/slice
  * and retrieval-quality completions of the wave-22 metric family.
  *
  *   - q238 per-slice ROC AUC: the q228 Mann–Whitney formulation
  *     PARTITIONED by a dimension (customer market segment via a dim
  *     join) — slice analysis is where single-number metrics hide
  *     regressions, and the partitioned histogram window is the shape
  *     that scales it (no single-partition frame anywhere).
  *   - q239 NDCG@10 per group: graded-relevance ranking quality with
  *     an INTEGER discount table (ppm of 1/log2(rank+1), hardcoded) —
  *     engine-exact where float log2 discounts drift; both the model
  *     and the ideal ranking are per-group top-10 windows.
  */
object Wave25Ops {

  type Q = (SparkSession, String) => DataFrame

  /** ppm discount weights 1e6/log2(rank+1) for ranks 1..10 — shared
    * constant table with the oracle SQL (exactness by construction). */
  private val NdcgW =
    Seq(1000000L, 630930L, 500000L, 430677L, 386853L, 356207L, 333333L,
      315465L, 301030L, 289065L)

  val queries: Map[String, Q] = Map(
    // ---- q238: per-slice ROC AUC ---------------------------------------
    // Score = order total in cents, label = finished status, slice =
    // the customer's market segment (broadcast dim join — customer is
    // the small side here; at parity-size dims it's a plain hash
    // join). Histogram per (slice, score), cumulative window
    // PARTITIONED on the slice, per-slice U2/AUC — the corpus never
    // sees a global ordering, so the plan is fully parallel across
    // slices AND across each slice's hash partitions.
    "q238_sliced_auc" -> ((s, d) => {
      val o = table(s, d, "orders").select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END" +
          " AS BIGINT)").as("pos"))
      val c = table(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("slice"))
      val h = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("slice", "cents")
        .agg(sum("pos").as("pos_s"), sum(expr("1 - pos")).as("neg_s"))
      val below = Window.partitionBy("slice").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("cnb", coalesce(sum("neg_s").over(below), lit(0L)))
        .groupBy("slice")
        .agg(sum(expr("pos_s * (2 * cnb + neg_s)")).as("u2"),
          sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"))
        .filter(col("n_pos") > 0 && col("n_neg") > 0)
        .select(col("slice"), col("n_pos"), col("n_neg"), col("u2"),
          expr("u2 * 1000000L div (2 * n_pos * n_neg)").as("auc_ppm"))
    }),

    // ---- q239: NDCG@10 per group ---------------------------------------
    // Groups = document sources; the "model" ranks docs by length
    // (n_chars desc), graded relevance from char thresholds (0/1/2).
    // DCG@10 over the model order, IDCG@10 over the relevance-ideal
    // order, both as per-group top-10 windows (WindowGroupLimit — the
    // group is never fully sorted past its top-k under AQE's limit
    // pushdown; groups hash-partition freely). ndcg in exact ppm via
    // the shared integer discount table.
    "q239_ndcg_at_10" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("n_chars"),
          expr("CAST(CASE WHEN n_chars >= 400 THEN 2 WHEN n_chars >= 200" +
            " THEN 1 ELSE 0 END AS BIGINT)").as("rel"))
      val w = array(NdcgW.map(lit): _*)
      val byModel = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val byIdeal = Window.partitionBy("source")
        .orderBy(col("rel").desc, col("doc_id").asc)
      val ranked = docs
        .withColumn("mr", row_number().over(byModel))
        .withColumn("ir", row_number().over(byIdeal))
      val dcg = ranked.filter(col("mr") <= 10).groupBy("source")
        .agg(sum(col("rel") * element_at(w, col("mr").cast("int")))
          .as("dcg"))
      val idcg = ranked.filter(col("ir") <= 10).groupBy("source")
        .agg(sum(col("rel") * element_at(w, col("ir").cast("int")))
          .as("idcg"))
      dcg.join(idcg, "source").filter(col("idcg") > 0)
        .select(col("source"), col("dcg"), col("idcg"),
          expr("dcg * 1000000L div idcg").as("ndcg_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q238_sliced_auc" ->
      """WITH o AS (
           SELECT o_custkey,
                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
           FROM orders),
         j AS (
           SELECT c_mktsegment AS slice, cents, pos
           FROM o JOIN customer ON o_custkey = c_custkey),
         hist AS (
           SELECT slice, cents, sum(pos) AS pos_s,
                  sum(1 - pos) AS neg_s
           FROM j GROUP BY 1, 2),
         cum AS (
           SELECT slice, pos_s, neg_s,
                  coalesce(sum(neg_s) OVER (PARTITION BY slice
                    ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cnb
           FROM hist),
         agg AS (
           SELECT slice, sum(pos_s * (2 * cnb + neg_s)) AS u2,
                  sum(pos_s) AS n_pos, sum(neg_s) AS n_neg
           FROM cum GROUP BY 1)
         SELECT slice, CAST(n_pos AS BIGINT) AS n_pos,
                CAST(n_neg AS BIGINT) AS n_neg,
                CAST(u2 AS BIGINT) AS u2,
                CAST(u2 * 1000000 // (2 * n_pos * n_neg) AS BIGINT)
                  AS auc_ppm
         FROM agg WHERE n_pos > 0 AND n_neg > 0""",
    "q239_ndcg_at_10" ->
      """WITH docs AS (
           SELECT source, doc_id, n_chars,
                  CASE WHEN n_chars >= 400 THEN 2
                       WHEN n_chars >= 200 THEN 1 ELSE 0 END AS rel
           FROM documents),
         wt(rnk, wgt) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
           (4, 430677), (5, 386853), (6, 356207), (7, 333333),
           (8, 315465), (9, 301030), (10, 289065)),
         ranked AS (
           SELECT source, rel,
                  row_number() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id ASC) AS mr,
                  row_number() OVER (PARTITION BY source
                    ORDER BY rel DESC, doc_id ASC) AS ir
           FROM docs),
         dcg AS (
           SELECT source, sum(rel * wgt) AS dcg
           FROM ranked JOIN wt ON mr = rnk GROUP BY 1),
         idcg AS (
           SELECT source, sum(rel * wgt) AS idcg
           FROM ranked JOIN wt ON ir = rnk GROUP BY 1)
         SELECT source, CAST(dcg AS BIGINT) AS dcg,
                CAST(idcg AS BIGINT) AS idcg,
                CAST(dcg * 1000000 // idcg AS BIGINT) AS ndcg_ppm
         FROM dcg JOIN idcg USING (source) WHERE idcg > 0""")
}
