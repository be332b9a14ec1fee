package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 90: revenue accounting — the growth-accounting
  * decomposition (every month's revenue delta split into new /
  * expansion / contraction / churned customer money, the SaaS
  * operating review) and a per-nation benchmark card (percentile rank
  * + robust deviation among peers). Growth accounting is one
  * customer×month fold plus a per-customer lag; the month frame is
  * calendar-bounded.
  */
object Wave90Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q367: month-over-month growth accounting -----------------------
    // Per customer×month revenue cents (months as yyyy-MM strings);
    // each customer's consecutive ACTIVE months pair up via lag over
    // the customer window; a gap month means the transition is
    // churn-then-new (the standard convention). Per month out: the
    // five flows (new, expansion, contraction, churn — signed) and
    // net; Σ flows = month-over-month revenue delta by construction
    // (spec-pinned identity).
    "q367_growth_accounting" -> ((s, d) => {
      val cm = table(s, d, "orders")
        .groupBy(col("o_custkey").as("ck"),
          expr("""datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')
              div 30""").as("m"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val w = Window.partitionBy("ck").orderBy("m")
      val flows = cm
        .withColumn("pm", lag("m", 1).over(w))
        .withColumn("pc", lag("cents", 1).over(w))
        .withColumn("prev",
          when(col("pm").isNotNull && col("pm") === col("m") - 1,
            col("pc")).otherwise(lit(0L)))
        .select(col("m"), col("cents"), col("prev"))
      val gains = flows.groupBy("m").agg(
        sum(when(col("prev") === 0, col("cents")).otherwise(0L))
          .as("new_cents"),
        sum(when(col("prev") > 0 && col("cents") > col("prev"),
          col("cents") - col("prev")).otherwise(0L))
          .as("expansion_cents"),
        sum(when(col("prev") > 0 && col("cents") < col("prev"),
          col("cents") - col("prev")).otherwise(0L))
          .as("contraction_cents"),
        sum("cents").as("revenue_cents"))
      // churn: customers active in m−1 with NO row in m
      val churn = cm.select(col("ck"), (col("m") + 1).as("m"),
          col("cents").as("prev_cents"))
        .join(cm.select(col("ck"), col("m"),
          lit(1L).as("active")), Seq("ck", "m"), "left_anti")
        .groupBy("m")
        .agg((-sum("prev_cents")).as("churned_cents"))
      gains.join(churn, Seq("m"), "left")
        .na.fill(0L, Seq("churned_cents"))
        .select(col("m"), col("revenue_cents"), col("new_cents"),
          col("expansion_cents"), col("contraction_cents"),
          col("churned_cents"),
          (col("new_cents") + col("expansion_cents")
            + col("contraction_cents") + col("churned_cents"))
            .as("net_cents"))
    }),

    // ---- q368: nation benchmark card ------------------------------------
    // Per nation: revenue, percentile rank among the 25 peers
    // (inclusive), and robust deviation = (rev − median)·1e6 div MAD
    // (median absolute deviation, exact order stats on the bounded
    // nation frame). The "how does my market compare" card.
    "q368_nation_benchmark" -> ((s, d) => {
      val rev = table(s, d, "orders")
        .join(table(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("nat"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("rev"))
      val withRank = rev
        .withColumn("rk", rank().over(Window.orderBy("rev")))
        .withColumn("n", expr("count(1) OVER ()"))
      val med = withRank
        .agg(min(when(col("rk") * 2 >= col("n"), col("rev")))
          .as("median"))
      val withDev = rev.crossJoin(broadcast(med))
        .withColumn("adev", abs(col("rev") - col("median")))
      val mad = withDev
        .withColumn("rk", rank().over(Window.orderBy("adev")))
        .withColumn("n", expr("count(1) OVER ()"))
        .agg(min(when(col("rk") * 2 >= col("n"), col("adev")))
          .as("mad"))
      withRank.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
        .select(col("nat"), col("rev").as("rev_cents"),
          expr("rk * 1000000 div n").as("pct_rank_ppm"),
          expr("""CASE WHEN mad = 0 THEN 0
              ELSE (rev - median) * 1000000 div mad END""")
            .as("robust_dev_micro"))
    }))

  val oracle: Map[String, String] = Map(
    "q367_growth_accounting" ->
      """WITH cm AS (
           SELECT o_custkey AS ck,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 30 AS m,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1, 2),
         flows AS (
           SELECT m, cents,
             CASE WHEN lag(m) OVER w IS NOT NULL
                    AND lag(m) OVER w = m - 1
               THEN lag(cents) OVER w ELSE 0 END AS prev
           FROM cm WINDOW w AS (PARTITION BY ck ORDER BY m)),
         gains AS (
           SELECT m,
             sum(CASE WHEN prev = 0 THEN cents ELSE 0 END) AS new_cents,
             sum(CASE WHEN prev > 0 AND cents > prev
               THEN cents - prev ELSE 0 END) AS expansion_cents,
             sum(CASE WHEN prev > 0 AND cents < prev
               THEN cents - prev ELSE 0 END) AS contraction_cents,
             sum(cents) AS revenue_cents
           FROM flows GROUP BY 1),
         churn AS (
           SELECT a.m + 1 AS m, -sum(a.cents) AS churned_cents
           FROM cm a LEFT JOIN cm b
             ON a.ck = b.ck AND b.m = a.m + 1
           WHERE b.ck IS NULL
           GROUP BY 1)
         SELECT CAST(g.m AS BIGINT) AS m,
           CAST(revenue_cents AS BIGINT) AS revenue_cents,
           CAST(new_cents AS BIGINT) AS new_cents,
           CAST(expansion_cents AS BIGINT) AS expansion_cents,
           CAST(contraction_cents AS BIGINT) AS contraction_cents,
           CAST(coalesce(churned_cents, 0) AS BIGINT) AS churned_cents,
           CAST(new_cents + expansion_cents + contraction_cents
             + coalesce(churned_cents, 0) AS BIGINT) AS net_cents
         FROM gains g LEFT JOIN churn ON g.m = churn.m""",

    "q368_nation_benchmark" ->
      """WITH rev AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nat,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS rev
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1),
         rk AS (
           SELECT *, rank() OVER (ORDER BY rev) AS rk,
             count(*) OVER () AS n
           FROM rev),
         med AS (
           SELECT min(CASE WHEN rk * 2 >= n THEN rev END) AS median
           FROM rk),
         dev AS (SELECT nat, rev, abs(rev - median) AS adev
                 FROM rev, med),
         madr AS (
           SELECT *, rank() OVER (ORDER BY adev) AS rk,
             count(*) OVER () AS n
           FROM dev),
         mad AS (
           SELECT min(CASE WHEN rk * 2 >= n THEN adev END) AS mad
           FROM madr)
         SELECT rk.nat, CAST(rk.rev AS BIGINT) AS rev_cents,
           CAST(rk.rk * 1000000 // rk.n AS BIGINT) AS pct_rank_ppm,
           CAST(CASE WHEN mad = 0 THEN 0
             ELSE (rk.rev - median) * 1000000 // mad END AS BIGINT)
             AS robust_dev_micro
         FROM rk, med, mad""")
}
