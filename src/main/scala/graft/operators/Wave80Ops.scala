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
      // ONE pass per CHILD table, not per FK edge: the child scans
      // once, left-joins each referenced parent's DISTINCT key set,
      // and a single conditional aggregation counts rows and per-edge
      // misses; the per-edge report rows unpivot from that one
      // aggregate row. The former shape ran an anti-join branch plus
      // two aggregates PER EDGE — lineitem alone was scanned three
      // times (guide §1.2 step 1). Counts identical: a left-join miss
      // against a distinct parent key set IS the anti-join membership
      // test (null child keys miss in both shapes).
      def pkeys(t: String, k: String, as: String) = table(s, d, t)
        .select(col(k).cast("long").as(as)).distinct()
      def unpivot(agg1: DataFrame,
          edges: Seq[(String, String)]): DataFrame =
        agg1.select(col("n_child"), explode(array(edges.map {
          case (e, oc) => struct(lit(e).as("e"), col(oc).as("o"))
        }: _*)).as("x"))
          .select(col("x.e").as("fk_edge"), col("n_child"),
            col("x.o").as("n_orphans"),
            expr("x.o * 1000000 div n_child").as("orphan_ppm"))
      def report(child: DataFrame,
          fks: Seq[(String, String, String, String)]): DataFrame = {
        // fks: (edgeName, childKey, parentTable, parentKey)
        val base = child.select(fks.zipWithIndex.map { case (fk, i) =>
          col(fk._2).cast("long").as(s"fk$i") }: _*)
        val joined = fks.zipWithIndex.foldLeft(base) {
          case (df, ((_, _, pt, pk), i)) =>
            df.join(pkeys(pt, pk, s"pk$i"),
              col(s"fk$i") === col(s"pk$i"), "left_outer")
        }
        val agg1 = joined.agg(count(lit(1)).as("n_child"),
          fks.indices.map(i => sum(when(col(s"pk$i").isNull, 1L)
            .otherwise(0L)).as(s"o$i")): _*)
        unpivot(agg1, fks.zipWithIndex.map { case ((e, _, _, _), i) =>
          (e, s"o$i") })
      }
      Seq(
        report(table(s, d, "lineitem"), Seq(
          ("lineitem->orders", "l_orderkey", "orders", "o_orderkey"),
          ("lineitem->part", "l_partkey", "part", "p_partkey"),
          ("lineitem->supplier", "l_suppkey", "supplier", "s_suppkey"))),
        report(table(s, d, "orders"), Seq(
          ("orders->customer", "o_custkey", "customer", "c_custkey"))),
        report(table(s, d, "customer"), Seq(
          ("customer->nation", "c_nationkey", "nation", "n_nationkey"))),
        report(table(s, d, "supplier"), Seq(
          ("supplier->nation", "s_nationkey", "nation", "n_nationkey"))),
        report(table(s, d, "nation"), Seq(
          ("nation->region", "n_regionkey", "region", "r_regionkey"))))
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
