package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 95: grouped trend + diversity readouts — per-nation
  * revenue trend slopes (grouped OLS over month indices: every group's
  * regression from ONE keyed moment pass) and effective assortment
  * breadth (exp of the part-mix entropy — "how many parts does this
  * nation REALLY buy", the ecology/assortment diversity number).
  */
object Wave95Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q377: per-nation monthly revenue trend slope --------------------
    // Month index x (epoch-months), y = nation-month revenue cents;
    // grouped OLS slope_micro per nation (DECIMAL moments) — cents
    // per month, exactly. Ranked output tells which markets grow.
    "q377_nation_trend_slopes" -> ((s, d) => {
      val nm = table(s, d, "orders")
        .join(table(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("nat"),
          expr("""datediff(CAST(o_orderdate AS DATE),
              DATE '1970-01-01') div 30""").as("x"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("y"))
      nm.groupBy("nat")
        .agg(count(lit(1)).as("n_months"), sum("x").as("sx"),
          sum("y").as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .filter(col("n_months") >= 2)
        .select(col("nat"), col("n_months"),
          expr("""CAST(
              (CAST(n_months AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
              div (CAST(n_months AS DECIMAL(38,0)) * sxx
                 - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""")
            .as("slope_micro"))
    }),

    // ---- q378: effective assortment breadth per nation --------------------
    // Part-quantity shares per nation; Shannon entropy in micro-nats
    // (the q99 ln discipline: −Σ q_p·⌊ln(q_p/Q)·1e6⌋ div Q), then
    // effective breadth = ⌊exp(H)⌋ — exp on a micro-derived double,
    // pinned identically in both engines. 25 parts bought equally =
    // breadth 25; one dominant part collapses it toward 1.
    "q378_assortment_breadth" -> ((s, d) => {
      val np = table(s, d, "lineitem")
        .join(table(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(table(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("nat"),
          col("l_partkey").as("pk"))
        .agg(sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("q"))
      val tot = np.groupBy("nat").agg(sum("q").as("qt"),
        count(lit(1)).as("n_parts"))
      np.join(broadcast(tot), "nat")
        .withColumn("term", expr(
          "-(q * CAST(floor(ln((1.0 * q) / qt) * 1000000) AS BIGINT))"))
        .groupBy("nat")
        .agg(max("n_parts").as("n_parts"),
          expr("sum(term) div max(qt)").as("h_micro"))
        .withColumn("eff_breadth", expr(
          """CAST(floor(exp(CAST(h_micro AS DOUBLE) / 1000000))
             AS BIGINT)"""))
    }))

  val oracle: Map[String, String] = Map(
    "q377_nation_trend_slopes" ->
      """WITH nm AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nat,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 30 AS x,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS y
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         m AS (
           SELECT nat, count(*) AS n_months, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy
           FROM nm GROUP BY 1)
         SELECT nat, CAST(n_months AS BIGINT) AS n_months,
           CAST((CAST(n_months AS HUGEINT) * sxy
               - CAST(sx AS HUGEINT) * sy) * 1000000
             // (CAST(n_months AS HUGEINT) * sxx
                - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS slope_micro
         FROM m WHERE n_months >= 2""",

    "q378_assortment_breadth" ->
      """WITH np AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nat, l_partkey AS pk,
             sum(CAST(floor(l_quantity) AS BIGINT)) AS q
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         tot AS (SELECT nat, sum(q) AS qt, count(*) AS n_parts
                 FROM np GROUP BY 1),
         terms AS (
           SELECT np.nat, tot.n_parts, tot.qt,
             -(q * CAST(floor(ln((1.0 * q) / qt) * 1000000) AS BIGINT))
               AS term
           FROM np JOIN tot ON np.nat = tot.nat),
         h AS (
           SELECT nat, CAST(max(n_parts) AS BIGINT) AS n_parts,
             CAST(sum(term) // max(qt) AS BIGINT) AS h_micro
           FROM terms GROUP BY 1)
         SELECT nat, n_parts, h_micro,
           CAST(floor(exp(CAST(h_micro AS DOUBLE) / 1000000))
             AS BIGINT) AS eff_breadth
         FROM h""")
}
