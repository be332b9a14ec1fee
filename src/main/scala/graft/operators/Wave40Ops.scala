package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 40: storage planning + data repair.
  *
  *   - q265 dictionary-encoding advisor: per-column plain vs
  *     dict-encoded size estimate — the storage-layout ANALYZE a
  *     100 TB parquet rewrite runs before choosing encodings.
  *   - q266 exact-median imputation: repair deterministic missingness
  *     with the per-group exact median, computed over the value
  *     HISTOGRAM (domain-bounded cumulative window) — never a
  *     per-group sort of the corpus.
  */
object Wave40Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Columns the encoding advisor profiles: the low-cardinality
    * dictionary wins and the high-cardinality dictionary loss
    * (c_name) in one report. */
  private val EncCols: Seq[(String, String)] = Seq(
    ("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
    ("customer", "c_mktsegment"), ("customer", "c_name"),
    ("part", "p_type"), ("part", "p_brand"),
    ("documents", "lang"), ("documents", "source"),
    ("events", "event_type"))

  val queries: Map[String, Q] = Map(
    // ---- q265: dictionary-encoding advisor -----------------------------
    // q222's stacked-scan shape again: one scan per table, ONE
    // (col, value) shuffle carrying map-side-combined per-value
    // counts, then a per-column rollup. Sizes in character units
    // (ASCII corpus): plain = Σ len(v); dict = Σ_distinct len(v) +
    // n·ceil(log2 ndv) bits. The code width comes from
    // length(bin(ndv−1)) — exact integer bit length, no float log2.
    // ratio_ppm < 1e6 means the dictionary wins; c_name (unique per
    // row) reports > 1e6 — the advisor's negative control.
    "q265_encoding_advisor" -> ((s, d) => {
      val stacked = EncCols.groupBy(_._1).toSeq.map { case (t, tc) =>
        table(s, d, t).select(explode(array(tc.map { case (_, c) =>
          struct(lit(s"$t.$c").as("col_name"),
            col(c).cast("string").as("v"))
        }: _*)).as("p"))
          .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      }.reduce(_ unionByName _)
      val perVal = stacked.groupBy("col_name", "v")
        .agg(count(lit(1)).as("c"), length(col("v")).cast("long").as("len"))
      perVal.groupBy("col_name")
        .agg(sum("c").as("n"), count(lit(1)).as("ndv"),
          sum(expr("c * len")).as("plain_units"),
          sum("len").as("dict_units"))
        .select(col("col_name"), col("n"), col("ndv"),
          col("plain_units"), col("dict_units"),
          length(bin(col("ndv") - 1)).cast("long").as("code_bits"),
          (col("dict_units") +
            expr("(n * length(bin(ndv - 1)) + 7) div 8")).as("dict_total"),
          expr("""(dict_units + (n * length(bin(ndv - 1)) + 7) div 8)
                  * 1000000 div plain_units""").as("ratio_ppm"))
    }),

    // ---- q266: exact-median imputation ---------------------------------
    // Deterministic missingness (event_id % 7 = 0 plays the NULL); the
    // repair value is the per-type LOWER MEDIAN of present cents —
    // exact, via the (type, cents) histogram and a cumulative window
    // whose frame is the VALUE DOMAIN, not the corpus (q228's
    // backbone). Output is the per-type repair report: counts, the
    // imputed median, and the post-repair total — the audit trail a
    // data-repair job must emit.
    "q266_median_impute" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("event_id"), col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val present = ev.filter(col("event_id") % 7 =!= 0)
      val hist = present.groupBy("event_type", "cents")
        .agg(count(lit(1)).as("c"))
      val tot = present.groupBy("event_type")
        .agg(count(lit(1)).as("n_present"),
          sum("cents").as("present_sum"))
      val wCum = Window.partitionBy("event_type").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = hist.withColumn("cum", sum("c").over(wCum))
        .join(broadcast(tot), "event_type")
        .filter(col("cum") >= expr("(n_present + 1) div 2"))
        .groupBy("event_type").agg(min("cents").as("median_cents"))
      val missing = ev.filter(col("event_id") % 7 === 0)
        .groupBy("event_type").agg(count(lit(1)).as("n_missing"))
      tot.join(med, "event_type").join(missing, "event_type")
        .select(col("event_type"), col("n_present"), col("n_missing"),
          col("median_cents"),
          (col("present_sum") + col("n_missing") * col("median_cents"))
            .as("total_after_impute"))
    }))

  private val encStackSql = EncCols.map { case (t, c) =>
    s"SELECT '$t.$c' AS col_name, CAST($c AS VARCHAR) AS v FROM $t"
  }.mkString("\n UNION ALL ")

  val oracle: Map[String, String] = Map(
    "q265_encoding_advisor" ->
      s"""WITH stacked AS (
           $encStackSql),
         pv AS (
           SELECT col_name, v, count(*) AS c,
             CAST(length(v) AS BIGINT) AS len
           FROM stacked GROUP BY col_name, v),
         agg AS (
           SELECT col_name, CAST(sum(c) AS BIGINT) AS n,
             count(*) AS ndv,
             CAST(sum(c * len) AS BIGINT) AS plain_units,
             CAST(sum(len) AS BIGINT) AS dict_units
           FROM pv GROUP BY col_name)
         SELECT col_name, n, ndv, plain_units, dict_units,
           CAST(length(bin(ndv - 1)) AS BIGINT) AS code_bits,
           dict_units + (n * length(bin(ndv - 1)) + 7) // 8 AS dict_total,
           (dict_units + (n * length(bin(ndv - 1)) + 7) // 8)
             * 1000000 // plain_units AS ratio_ppm
         FROM agg""",

    "q266_median_impute" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
         present AS (SELECT * FROM ev WHERE event_id % 7 <> 0),
         hist AS (
           SELECT event_type, cents, count(*) AS c
           FROM present GROUP BY 1, 2),
         tot AS (
           SELECT event_type, count(*) AS n_present,
             CAST(sum(cents) AS BIGINT) AS present_sum
           FROM present GROUP BY 1),
         cum AS (
           SELECT h.event_type, h.cents,
             CAST(sum(h.c) OVER (PARTITION BY h.event_type
               ORDER BY h.cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             t.n_present
           FROM hist h JOIN tot t USING (event_type)),
         med AS (
           SELECT event_type, min(cents) AS median_cents
           FROM cum WHERE cum >= (n_present + 1) // 2
           GROUP BY event_type),
         miss AS (
           SELECT event_type, count(*) AS n_missing
           FROM ev WHERE event_id % 7 = 0 GROUP BY 1)
         SELECT t.event_type, t.n_present, m2.n_missing, m.median_cents,
           t.present_sum + m2.n_missing * m.median_cents
             AS total_after_impute
         FROM tot t JOIN med m USING (event_type)
         JOIN miss m2 USING (event_type)""")
}
