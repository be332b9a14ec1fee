package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-6 wave 80: declarative data-quality gates — an
  * expectation-suite conformance report (each contract check scored in
  * one corpus pass, Great-Expectations-style) and a consolidated
  * referential-integrity report over every FK edge of the star schema
  * (anti-join orphan counts, the q13 shape rolled into one audit).
  */
object Wave80Ops {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- q347: contract conformance suite over the event feed ----------
    // Six declarative expectations evaluated as predicate sums in ONE
    // pass (map-side combinable), then unpivoted to a row per check
    // with pass-rate ppm and a pass/fail verdict. The check list is
    // the data contract; a new feed version that breaks one shows up
    // as a 'fail' row, not a silent drift.
    "q347_contract_conformance" -> ((s, d) => {
      val checks = Seq(
        ("value_nonneg", "value >= 0"),
        ("value_under_1k", "value < 1000"),
        ("type_in_enum",
          "event_type IN ('click','error','purchase','signup','view')"),
        ("user_id_nonneg", "user_id >= 0"),
        ("props_present", "props IS NOT NULL AND props <> ''"),
        ("ts_in_window",
          "ts >= 1577836800000000000 AND ts < 1893456000000000000"))
      val agg = table(s, d, "events").agg(
        count(lit(1)).as("n_rows"),
        checks.map { case (nm, p) =>
          sum(expr(s"CAST($p AS BIGINT)")).as(s"p_$nm")
        }: _*)
      agg.select(col("n_rows"), explode(array(
          checks.map { case (nm, _) =>
            struct(lit(nm).as("check"), col(s"p_$nm").as("n_pass"))
          }: _*)).as("c"))
        .select(col("c.check").as("check"), col("n_rows"),
          col("c.n_pass").as("n_pass"),
          expr("c.n_pass * 1000000 div n_rows").as("pass_ppm"),
          expr("""CASE WHEN c.n_pass = n_rows THEN 'pass'
              ELSE 'fail' END""").as("status"))
    }),

    // ---- q348: referential-integrity report over all FK edges ----------
    // Every FK edge of the schema scored by an anti-join orphan count
    // (child side shuffles once per edge on its key; parent sides are
    // dimension-sized or AQE-broadcast). One audit frame out: the
    // "is the star schema actually closed" report run before any
    // dimensional rollup is trusted.
    "q348_fk_integrity_report" -> ((s, d) => {
      def edge(name: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame = {
        val c = child.select(col(key).cast("long").as("k"))
        val orphans = c.join(
          parent.select(col(pkey).cast("long").as("k")).distinct(),
          Seq("k"), "left_anti")
        c.agg(count(lit(1)).as("n_child"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("fk_edge"), col("n_child"),
            col("n_orphans"),
            expr("n_orphans * 1000000 div n_child").as("orphan_ppm"))
      }
      val li = table(s, d, "lineitem")
      Seq(
        edge("lineitem->orders", li, "l_orderkey",
          table(s, d, "orders"), "o_orderkey"),
        edge("lineitem->part", li, "l_partkey",
          table(s, d, "part"), "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey",
          table(s, d, "supplier"), "s_suppkey"),
        edge("orders->customer", table(s, d, "orders"), "o_custkey",
          table(s, d, "customer"), "c_custkey"),
        edge("customer->nation", table(s, d, "customer"), "c_nationkey",
          table(s, d, "nation"), "n_nationkey"),
        edge("supplier->nation", table(s, d, "supplier"), "s_nationkey",
          table(s, d, "nation"), "n_nationkey"),
        edge("nation->region", table(s, d, "nation"), "n_regionkey",
          table(s, d, "region"), "r_regionkey"))
        .reduce(_ unionByName _)
    }))

  val oracle: Map[String, String] = Map(
    "q347_contract_conformance" ->
      """WITH agg AS (
           SELECT count(*) AS n_rows,
             sum(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS p1,
             sum(CASE WHEN value < 1000 THEN 1 ELSE 0 END) AS p2,
             sum(CASE WHEN event_type IN
               ('click','error','purchase','signup','view')
               THEN 1 ELSE 0 END) AS p3,
             sum(CASE WHEN user_id >= 0 THEN 1 ELSE 0 END) AS p4,
             sum(CASE WHEN props IS NOT NULL AND props <> ''
               THEN 1 ELSE 0 END) AS p5,
             sum(CASE WHEN epoch_ns(ts) >= 1577836800000000000
               AND epoch_ns(ts) < 1893456000000000000
               THEN 1 ELSE 0 END) AS p6
           FROM events),
         u AS (
           SELECT 'value_nonneg' AS check_nm, n_rows, p1 AS n_pass
             FROM agg
           UNION ALL SELECT 'value_under_1k', n_rows, p2 FROM agg
           UNION ALL SELECT 'type_in_enum', n_rows, p3 FROM agg
           UNION ALL SELECT 'user_id_nonneg', n_rows, p4 FROM agg
           UNION ALL SELECT 'props_present', n_rows, p5 FROM agg
           UNION ALL SELECT 'ts_in_window', n_rows, p6 FROM agg)
         SELECT check_nm AS "check", CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_pass AS BIGINT) AS n_pass,
           CAST(n_pass * 1000000 // n_rows AS BIGINT) AS pass_ppm,
           CASE WHEN n_pass = n_rows THEN 'pass' ELSE 'fail' END
             AS status
         FROM u""",

    "q348_fk_integrity_report" ->
      """WITH e1 AS (
           SELECT 'lineitem->orders' AS fk_edge, count(*) AS n_child,
             sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS n_orphans
           FROM lineitem
           LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l_orderkey = o_orderkey),
         e2 AS (
           SELECT 'lineitem->part', count(*),
             sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
           FROM lineitem
           LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
             ON l_partkey = p_partkey),
         e3 AS (
           SELECT 'lineitem->supplier', count(*),
             sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END)
           FROM lineitem
           LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) su
             ON l_suppkey = s_suppkey),
         e4 AS (
           SELECT 'orders->customer', count(*),
             sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
           FROM orders
           LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o_custkey = c_custkey),
         e5 AS (
           SELECT 'customer->nation', count(*),
             sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
           FROM customer
           LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
             ON c_nationkey = n_nationkey),
         e6 AS (
           SELECT 'supplier->nation', count(*),
             sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
           FROM supplier
           LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
             ON s_nationkey = n_nationkey),
         e7 AS (
           SELECT 'nation->region', count(*),
             sum(CASE WHEN r_regionkey IS NULL THEN 1 ELSE 0 END)
           FROM nation
           LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) r
             ON n_regionkey = r_regionkey),
         u AS (
           SELECT * FROM e1 UNION ALL SELECT * FROM e2
           UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
           UNION ALL SELECT * FROM e5 UNION ALL SELECT * FROM e6
           UNION ALL SELECT * FROM e7)
         SELECT fk_edge, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           CAST(n_orphans * 1000000 // n_child AS BIGINT) AS orphan_ppm
         FROM u""")
}
