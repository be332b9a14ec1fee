package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 62: Merkle drill-down — the recursion step q188's
  * order-insensitive bucketed checksum documented ("a mismatched
  * bucket narrows the diff to 1/64 of the keyspace; recurse"). Two
  * corpus versions (q123's deterministic slices) compare by 64
  * top-level checksums; ONLY the mismatched buckets expand one level
  * (64 sub-buckets each), so the localization cost is proportional to
  * the number of DIFFERING regions — never the table — which is how
  * two 100 TB replicas reconcile with kilobytes of exchanged digests.
  */
object Wave62Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q312: two-level Merkle diff localization ----------------------
    // Row hash: 52 md5 bits of (doc_id, version text); level-1 bucket
    // hv % 64, level-2 (hv div 64) % 64. One pass per version computes
    // the (b1, b2) cell frame (≤ 4096 rows — domain-bounded);
    // level-1 totals re-aggregate the cells. Mismatched level-1
    // buckets (full outer on checksums) gate which level-2 cells are
    // emitted; each output row is a narrowed differing region with
    // both sides' counts and residue checksums. Buckets where one
    // side is absent report zeros — absence IS the diff.
    "q312_merkle_diff_drilldown" -> ((s, d) => {
      def cells(version: Int): DataFrame = {
        val docs = table(s, d, "documents")
        val v =
          if (version == 1)
            docs.filter(col("doc_id") % 17 =!= 0)
              .select(col("doc_id"),
                when(col("doc_id") % 13 === 0, substring(col("text"), 1, 10))
                  .otherwise(col("text")).as("t"))
          else
            docs.filter(col("doc_id") % 19 =!= 0)
              .select(col("doc_id"), col("text").as("t"))
        v.select(expr(
            """CAST(conv(substring(md5(concat_ws('|',
                 CAST(doc_id AS STRING), t)), 1, 13), 16, 10)
               AS BIGINT)""").as("hv"))
          .select((col("hv") % 64).as("b1"),
            expr("(hv div 64) % 64").as("b2"),
            (col("hv") % 1000000007L).as("res"))
          .groupBy("b1", "b2")
          .agg(count(lit(1)).as("n"),
            (sum("res") % 1000000007L).as("c"))
      }
      val c1 = cells(1).persist()
      val c2 = cells(2).persist()
      def lvl1(c: DataFrame) = c.groupBy("b1")
        .agg(sum("n").as("n_l1"), (sum("c") % 1000000007L).as("c_l1"))
      val bad1 = lvl1(c1)
        .withColumnRenamed("n_l1", "n1").withColumnRenamed("c_l1", "ck1")
        .join(lvl1(c2)
          .withColumnRenamed("n_l1", "n2").withColumnRenamed("c_l1", "ck2"),
          Seq("b1"), "full_outer")
        .na.fill(0L, Seq("n1", "n2", "ck1", "ck2"))
        .filter(col("n1") =!= col("n2") || col("ck1") =!= col("ck2"))
        .select("b1")
      c1.select(col("b1"), col("b2"), col("n").as("n1"),
          col("c").as("ck1"))
        .join(c2.select(col("b1"), col("b2"), col("n").as("n2"),
          col("c").as("ck2")), Seq("b1", "b2"), "full_outer")
        .na.fill(0L, Seq("n1", "n2", "ck1", "ck2"))
        .join(bad1, Seq("b1"), "left_semi")
        .filter(col("n1") =!= col("n2") || col("ck1") =!= col("ck2"))
        .select("b1", "b2", "n1", "n2", "ck1", "ck2")
    }))

  val oracle: Map[String, String] = Map(
    "q312_merkle_diff_drilldown" ->
      """WITH v1 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN substr(text, 1, 10)
                  ELSE text END AS t
           FROM documents WHERE doc_id % 17 <> 0),
         v2 AS (SELECT doc_id, text AS t
                FROM documents WHERE doc_id % 19 <> 0),
         h1 AS (
           SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
             || '|' || t), 1, 13)) AS BIGINT) AS hv FROM v1),
         h2 AS (
           SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
             || '|' || t), 1, 13)) AS BIGINT) AS hv FROM v2),
         cell1 AS (
           SELECT hv % 64 AS b1, (hv // 64) % 64 AS b2,
             count(*) AS n, sum(hv % 1000000007) % 1000000007 AS c
           FROM h1 GROUP BY 1, 2),
         cell2 AS (
           SELECT hv % 64 AS b1, (hv // 64) % 64 AS b2,
             count(*) AS n, sum(hv % 1000000007) % 1000000007 AS c
           FROM h2 GROUP BY 1, 2),
         l1a AS (SELECT b1, sum(n) AS n_l1, sum(c) % 1000000007 AS c_l1
                 FROM cell1 GROUP BY 1),
         l1b AS (SELECT b1, sum(n) AS n_l1, sum(c) % 1000000007 AS c_l1
                 FROM cell2 GROUP BY 1),
         bad1 AS (
           SELECT coalesce(a.b1, b.b1) AS b1
           FROM l1a a FULL OUTER JOIN l1b b ON a.b1 = b.b1
           WHERE coalesce(a.n_l1, 0) <> coalesce(b.n_l1, 0)
              OR coalesce(a.c_l1, 0) <> coalesce(b.c_l1, 0)),
         cells AS (
           SELECT coalesce(a.b1, b.b1) AS b1,
             coalesce(a.b2, b.b2) AS b2,
             coalesce(a.n, 0) AS n1, coalesce(b.n, 0) AS n2,
             coalesce(a.c, 0) AS ck1, coalesce(b.c, 0) AS ck2
           FROM cell1 a FULL OUTER JOIN cell2 b
             ON a.b1 = b.b1 AND a.b2 = b.b2)
         SELECT CAST(c.b1 AS BIGINT) AS b1, CAST(c.b2 AS BIGINT) AS b2,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(ck1 AS BIGINT) AS ck1, CAST(ck2 AS BIGINT) AS ck2
         FROM cells c JOIN bad1 ON c.b1 = bad1.b1
         WHERE n1 <> n2 OR ck1 <> ck2""")
}
