package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 69: behavioral segmentation — sequential path mining
  * (the top event-type trigrams across user journeys, extending q280's
  * first-order transitions to third order) and RFM segmentation with
  * EXACT quintile thresholds (the q307 inclusive-CDF order-statistic
  * on per-dimension value histograms — no corpus-sized sort, no ntile
  * window over the customer frame).
  */
object Wave69Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q325: top event-type trigrams across user paths ---------------
    // Per-user event order is (ts, event_id) — the corpus-wide
    // convention; two leads over the user-partitioned window (per-user
    // histories are the bounded dimension, same contract as q280's
    // Markov fit) emit each 3-step path; one count shuffle on the
    // trigram key; TakeOrdered top-20 with full tie-break; shares in
    // ppm of ALL trigrams (scalar broadcast).
    "q325_path_trigrams" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tri = table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("t1"))
        .withColumn("t2", lead("t1", 1).over(w))
        .withColumn("t3", lead("t1", 2).over(w))
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      val tot = tri.agg(sum("n").as("n_tri"))
      tri.orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(20)
        .crossJoin(broadcast(tot))
        .select(col("t1"), col("t2"), col("t3"), col("n"),
          expr("n * 1000000 div n_tri").as("share_ppm"))
    }),

    // ---- q326: RFM segmentation with exact quintile thresholds ---------
    // Per customer (one orders pass): recency = days from last order
    // to the corpus max day (higher = staler), frequency = order
    // count, monetary = total dollars. Each dimension's four quintile
    // cuts come from a VALUE HISTOGRAM + cumulative window (the q307
    // inclusive-CDF convention: thr_j = min v with cum·5 ≥ n·j) — the
    // histograms are domain-bounded (days / counts / dollars), so no
    // corpus-sized ordered window exists anywhere. Scores are
    // 1 + Σ[v ≥ thr_j] (ascending in the value); the 12 thresholds
    // pivot into ONE broadcast row. Output: ≤125 segments with counts,
    // total-monetary mean, and corpus share.
    "q326_rfm_segmentation" -> ((s, d) => {
      val maxD = table(s, d, "orders")
        .agg(max(expr(
          "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"))
          .as("max_dd"))
      val cust = table(s, d, "orders")
        .select(col("o_custkey").as("ck"),
          expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
            .as("dd"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy("ck")
        .agg(max("dd").as("last_dd"), count(lit(1)).as("f"),
          expr("sum(cents) div 100").as("m"))
        .crossJoin(broadcast(maxD))
        .select(col("ck"),
          (col("max_dd") - col("last_dd")).cast("long").as("r"),
          col("f").cast("long").as("f"), col("m"))
      val unp = cust.select(explode(array(
        struct(lit("r").as("dim"), col("r").as("v")),
        struct(lit("f").as("dim"), col("f").as("v")),
        struct(lit("m").as("dim"), col("m").as("v")))).as("x"))
        .select(col("x.dim").as("dim"), col("x.v").as("v"))
      val h = unp.groupBy("dim", "v").agg(count(lit(1)).as("c"))
      val cum = h.withColumn("cum", sum("c").over(
          Window.partitionBy("dim").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(h.groupBy("dim").agg(sum("c").as("n_dim"))),
          "dim")
      val thr = cum.crossJoin(
          broadcast(s.range(1, 5).select(col("id").as("j"))))
        .filter(col("cum") * 5 >= col("n_dim") * col("j"))
        .groupBy("dim", "j").agg(min("v").as("thr"))
        .groupBy()
        .pivot(concat(col("dim"), lit("_"), col("j")),
          Seq("r_1", "r_2", "r_3", "r_4", "f_1", "f_2", "f_3", "f_4",
            "m_1", "m_2", "m_3", "m_4"))
        .agg(first("thr"))
      def score(v: String, p: String) = expr(
        s"""1 + CAST($v >= ${p}_1 AS BIGINT) +
            CAST($v >= ${p}_2 AS BIGINT) +
            CAST($v >= ${p}_3 AS BIGINT) +
            CAST($v >= ${p}_4 AS BIGINT)""")
      cust.crossJoin(broadcast(thr))
        .select(col("ck"), col("m"),
          (score("r", "r") * 100 + score("f", "f") * 10 + score("m", "m"))
            .as("segment"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          expr("sum(m) div count(1)").as("avg_m_dollars"))
        .withColumn("share_ppm",
          expr("n_customers * 1000000 div sum(n_customers) OVER ()"))
    }))

  val oracle: Map[String, String] = Map(
    "q325_path_trigrams" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) AS ts, event_id,
             event_type AS t1
           FROM events),
         tri0 AS (
           SELECT t1,
             lead(t1, 1) OVER w AS t2,
             lead(t1, 2) OVER w AS t3
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         tri AS (
           SELECT t1, t2, t3, count(*) AS n
           FROM tri0 WHERE t2 IS NOT NULL AND t3 IS NOT NULL
           GROUP BY 1, 2, 3),
         tot AS (SELECT sum(n) AS n_tri FROM tri),
         top AS (
           SELECT * FROM tri
           ORDER BY n DESC, t1, t2, t3 LIMIT 20)
         SELECT t1, t2, t3, CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // n_tri AS BIGINT) AS share_ppm
         FROM top, tot""",

    "q326_rfm_segmentation" ->
      """WITH mx AS (
           SELECT max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             AS max_dd FROM orders),
         cust AS (
           SELECT o_custkey AS ck,
             CAST(max_dd - max(CAST(o_orderdate AS DATE)
               - DATE '1970-01-01') AS BIGINT) AS r,
             CAST(count(*) AS BIGINT) AS f,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) // 100 AS m
           FROM orders, mx GROUP BY ck, max_dd),
         unp AS (
           SELECT 'r' AS dim, r AS v FROM cust
           UNION ALL SELECT 'f', f FROM cust
           UNION ALL SELECT 'm', m FROM cust),
         h AS (SELECT dim, v, count(*) AS c FROM unp GROUP BY 1, 2),
         cum AS (
           SELECT dim, v,
             sum(c) OVER (PARTITION BY dim ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM h),
         nd AS (SELECT dim, sum(c) AS n_dim FROM h GROUP BY 1),
         thr AS (
           SELECT cum.dim, jj.j, min(cum.v) AS thr
           FROM cum JOIN nd ON cum.dim = nd.dim
           CROSS JOIN (SELECT unnest(range(1, 5)) AS j) jj
           WHERE cum.cum * 5 >= nd.n_dim * jj.j
           GROUP BY 1, 2),
         p AS (
           SELECT
             max(CASE WHEN dim = 'r' AND j = 1 THEN thr END) AS r_1,
             max(CASE WHEN dim = 'r' AND j = 2 THEN thr END) AS r_2,
             max(CASE WHEN dim = 'r' AND j = 3 THEN thr END) AS r_3,
             max(CASE WHEN dim = 'r' AND j = 4 THEN thr END) AS r_4,
             max(CASE WHEN dim = 'f' AND j = 1 THEN thr END) AS f_1,
             max(CASE WHEN dim = 'f' AND j = 2 THEN thr END) AS f_2,
             max(CASE WHEN dim = 'f' AND j = 3 THEN thr END) AS f_3,
             max(CASE WHEN dim = 'f' AND j = 4 THEN thr END) AS f_4,
             max(CASE WHEN dim = 'm' AND j = 1 THEN thr END) AS m_1,
             max(CASE WHEN dim = 'm' AND j = 2 THEN thr END) AS m_2,
             max(CASE WHEN dim = 'm' AND j = 3 THEN thr END) AS m_3,
             max(CASE WHEN dim = 'm' AND j = 4 THEN thr END) AS m_4
           FROM thr),
         seg AS (
           SELECT m,
             (1 + CASE WHEN r >= r_1 THEN 1 ELSE 0 END
                + CASE WHEN r >= r_2 THEN 1 ELSE 0 END
                + CASE WHEN r >= r_3 THEN 1 ELSE 0 END
                + CASE WHEN r >= r_4 THEN 1 ELSE 0 END) * 100
             + (1 + CASE WHEN f >= f_1 THEN 1 ELSE 0 END
                  + CASE WHEN f >= f_2 THEN 1 ELSE 0 END
                  + CASE WHEN f >= f_3 THEN 1 ELSE 0 END
                  + CASE WHEN f >= f_4 THEN 1 ELSE 0 END) * 10
             + (1 + CASE WHEN m >= m_1 THEN 1 ELSE 0 END
                  + CASE WHEN m >= m_2 THEN 1 ELSE 0 END
                  + CASE WHEN m >= m_3 THEN 1 ELSE 0 END
                  + CASE WHEN m >= m_4 THEN 1 ELSE 0 END) AS segment
           FROM cust, p),
         g AS (
           SELECT segment, count(*) AS n_customers,
             sum(m) // count(*) AS avg_m_dollars
           FROM seg GROUP BY 1)
         SELECT CAST(segment AS BIGINT) AS segment,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(avg_m_dollars AS BIGINT) AS avg_m_dollars,
           CAST(n_customers * 1000000 // sum(n_customers) OVER ()
             AS BIGINT) AS share_ppm
         FROM g""")
}
