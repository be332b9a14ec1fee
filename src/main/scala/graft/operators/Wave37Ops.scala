package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 37: the classic multi-join OLAP shapes (TPC-H Q3 / Q5 /
  * Q10 analogues over the available columns). These exist to exercise —
  * and pin — the optimizer path the ad-hoc analytics surface lives on:
  * selective dimension filters pushed to the scans, small dims
  * broadcast, fact-fact equi-joins shuffled on their keys, exact
  * DECIMAL(18,2) money, deterministic top-k. q61/q62/q168 cover the
  * single-join/SQL surface; this wave adds the 3–6 table join DAGs.
  */
object Wave37Ops {

  type Q = (SparkSession, String) => DataFrame

  private val Dec = org.apache.spark.sql.types.DecimalType(18, 2)

  /** Exact discounted-revenue sum (same contract as RelationalOps:
    * both factors decimal BEFORE the multiply, engines never round a
    * double product). */
  private def revSum(price: Column, disc: Column): Column =
    sum(price.cast(Dec) * (lit(1).cast(Dec) - disc.cast(Dec)))
      .cast("double")

  val queries: Map[String, Q] = Map(
    // ---- q257: unshipped-order revenue (TPC-H Q3 shape) ----------------
    // Segment filter reaches the customer scan, both date filters push
    // into their scans (PushedFilters pinned in Wave37Spec via the
    // formatted plan), the customer dim broadcasts, and the
    // lineitem⋈orders fact join shuffles on the order key. Top-10 via
    // TakeOrdered (never a global sort); revenue DESC with l_orderkey
    // tie-break so the cut is engine-deterministic.
    "q257_unshipped_revenue" -> ((s, d) => {
      val c = table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = table(s, d, "orders")
        .filter(col("o_orderdate") < expr("TIMESTAMP '1998-06-01'"))
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "o_orderpriority")
      val l = table(s, d, "lineitem")
        .filter(col("l_shipdate") > expr("TIMESTAMP '1998-06-01'"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
    }),

    // ---- q258: local-supplier volume per nation (TPC-H Q5 shape) -------
    // The 6-table DAG: region→nation prune the supplier/customer dims,
    // the c_nationkey = s_nationkey "local" predicate rides the fact
    // join as a post-join filter on broadcast-joined dim columns, and
    // ONLY the lineitem⋈orders join shuffles. Region/nation/supplier/
    // customer are all broadcast — at 100 TB the fact tables dominate
    // and the dims still fit an executor, so this plan shape is
    // exactly the cluster plan.
    "q258_local_supplier_volume" -> ((s, d) => {
      val nat = table(s, d, "nation")
        .join(broadcast(table(s, d, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = table(s, d, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val cus = table(s, d, "customer").select("c_custkey", "c_nationkey")
      val o = table(s, d, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1997-01-01'") &&
          col("o_orderdate") < expr("TIMESTAMP '1998-01-01'"))
        .select("o_orderkey", "o_custkey")
      val l = table(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(revSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
    }),

    // ---- q259: returned-item revenue by customer (TPC-H Q10 shape) -----
    // Returnflag + quarter filters push to the scans; the customer and
    // nation dims broadcast onto the aggregated fact side. Top-20
    // lossage-free: the rollup groups on c_custkey ONLY (c_name /
    // c_acctbal / n_name are functionally dependent and joined back
    // after the top-k cut, so the shuffle carries narrow keys).
    "q259_returned_revenue" -> ((s, d) => {
      val o = table(s, d, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1997-01-01'") &&
          col("o_orderdate") < expr("TIMESTAMP '1997-04-01'"))
        .select("o_orderkey", "o_custkey")
      val l = table(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val top = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(revSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
      top
        .join(broadcast(table(s, d, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
          "c_custkey")
        .join(broadcast(table(s, d, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
    }))

  val oracle: Map[String, String] = Map(
    "q257_unshipped_revenue" ->
      """SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
             AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-06-01'
           AND l_shipdate > TIMESTAMP '1998-06-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q258_local_supplier_volume" ->
      """SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
             AS DOUBLE) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_nationkey = s_nationkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name""",

    "q259_returned_revenue" ->
      """WITH top AS (
           SELECT o_custkey AS c_custkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))))
               AS DOUBLE) AS revenue
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey
           WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1997-04-01'
             AND l_returnflag = 'R'
           GROUP BY o_custkey
           ORDER BY revenue DESC, o_custkey LIMIT 20)
         SELECT t.c_custkey, c.c_name, t.revenue, c.c_acctbal, n.n_name
         FROM top t
         JOIN customer c ON t.c_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey""")
}
