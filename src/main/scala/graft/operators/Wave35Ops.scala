package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 35: schema-discovery profiling (the ANALYZE tier a
  * lakehouse runs before trusting inbound data).
  *
  *   - q253 functional-dependency discovery: which X→Y dependencies
  *     hold among a candidate column set, with violation counts.
  *   - q254 candidate-key (uniqueness) discovery: which column
  *     combinations are unique, with duplication multiplicities.
  *
  * Both follow q222's stacked-scan shape: ONE table scan explodes the
  * candidate set map-side into (candidate, value) pairs and ONE
  * grouped shuffle answers every candidate at once — O(1) stages
  * regardless of how many dependencies/combinations are profiled,
  * where the naive per-candidate formulation schedules O(candidates)
  * scan+agg stages.
  */
object Wave35Ops {

  type Q = (SparkSession, String) => DataFrame

  /** FD candidate columns (orders). o_orderkey is excluded as lhs/rhs:
    * a primary key holds trivially against everything and would only
    * pad the stacked frame. The mix spans the FD spectrum — the
    * near-unique o_totalprice holds against everything at small
    * scale and degrades as collisions appear; the low-cardinality
    * status/priority columns fail against everything. Values compare
    * as per-engine string casts, which is sound because only equality
    * classes reach the output (counts), never the rendered strings. */
  private val FdCols = Seq("o_custkey", "o_orderstatus",
    "o_orderpriority", "o_orderdate", "o_totalprice")
  private val FdPairs =
    for { x <- FdCols; y <- FdCols if x != y } yield (x, y)

  /** Key-discovery candidates (lineitem): singletons, the pairs a
    * key-inference pass would propose, and the widest combination.
    * NOTE the synthetic generator does NOT honor TPC-H's
    * (l_orderkey, l_linenumber) primary key — discovery must report
    * what the data holds, not what the spec promises (at sf0.01 only
    * the 4-column combination is unique; at sf0.001 nothing is). That
    * is exactly why a lakehouse runs this audit before trusting an
    * upstream contract. */
  private val KeyCombos: Seq[Seq[String]] = Seq(
    Seq("l_orderkey"), Seq("l_partkey"), Seq("l_suppkey"),
    Seq("l_orderkey", "l_linenumber"),
    Seq("l_orderkey", "l_partkey"),
    Seq("l_partkey", "l_suppkey"),
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))

  val queries: Map[String, Q] = Map(
    // ---- q253: functional-dependency discovery -------------------------
    // Stacked (fd, x, y) pairs → groupBy (fd, x) with a distinct-y
    // count → per-dependency rollup. The first shuffle keys on
    // (fd, xv), so the 20 dependencies' group frames spread across ALL
    // partitions — no dependency is a hot key. The heavy phase carries
    // a small INT dependency id, not the two column-name strings — the
    // labels rode on every one of the 20 × |orders| stacked rows and
    // dominated the exchange (measured 9.9 → 0.75 s at sf1, the q222
    // lesson); names come back from a 20-row broadcast at the end.
    // X→Y holds iff no lhs group sees >1 distinct rhs value;
    // max_rhs_ndv says how badly a failing dependency fails (1 column
    // would need max_rhs_ndv repair values per key to normalize).
    "q253_fd_discovery" -> ((s, d) => {
      import s.implicits._
      val stacked = table(s, d, "orders")
        .select(explode(array(FdPairs.zipWithIndex.map {
          case ((x, y), i) =>
            struct(lit(i).as("fd"),
              col(x).cast("string").as("xv"),
              col(y).cast("string").as("yv"))
        }: _*)).as("p"))
        .select(col("p.fd").as("fd"), col("p.xv").as("xv"),
          col("p.yv").as("yv"))
      val names = broadcast(FdPairs.zipWithIndex
        .map { case ((x, y), i) => (i, x, y) }.toDF("fd", "lhs", "rhs"))
      stacked.groupBy("fd", "xv")
        .agg(countDistinct("yv").as("ndv_y"))
        .groupBy("fd")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("ndv_y") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("ndv_y").as("max_rhs_ndv"))
        .join(names, "fd")
        .select(col("lhs"), col("rhs"), col("n_groups"),
          col("n_violating"), col("max_rhs_ndv"),
          when(col("n_violating") === 0, 1L).otherwise(0L).as("holds"))
    }),

    // ---- q254: candidate-key (uniqueness) discovery ---------------------
    // Combo values concatenate with '|' (safe: all candidate columns
    // are integers). ONE groupBy (combo, v) carries every candidate's
    // multiplicity histogram; the rollup emits exact duplication
    // counts, so is_key is certain — not sampled.
    "q254_key_discovery" -> ((s, d) => {
      val stacked = table(s, d, "lineitem")
        .select(explode(array(KeyCombos.map { cols =>
          struct(lit(cols.mkString("+")).as("combo"),
            concat_ws("|", cols.map(c => col(c).cast("string")): _*)
              .as("v"))
        }: _*)).as("p"))
        .select(col("p.combo").as("combo"), col("p.v").as("v"))
      stacked.groupBy("combo", "v").agg(count(lit(1)).as("m"))
        .groupBy("combo")
        .agg(sum("m").as("n_rows"), count(lit(1)).as("n_distinct"),
          max("m").as("max_multiplicity"))
        .select(col("combo"), col("n_rows"), col("n_distinct"),
          (col("n_rows") - col("n_distinct")).as("n_extra_rows"),
          col("max_multiplicity"),
          when(col("n_rows") === col("n_distinct"), 1L).otherwise(0L)
            .as("is_key"))
    }))

  private val fdStackSql = FdPairs.map { case (x, y) =>
    s"""SELECT '$x' AS lhs, '$y' AS rhs, CAST($x AS VARCHAR) AS xv,
          CAST($y AS VARCHAR) AS yv FROM orders"""
  }.mkString("\n UNION ALL ")

  private val keyStackSql = KeyCombos.map { cols =>
    val v = cols.map(c => s"CAST($c AS VARCHAR)").mkString(" || '|' || ")
    s"SELECT '${cols.mkString("+")}' AS combo, $v AS v FROM lineitem"
  }.mkString("\n UNION ALL ")

  val oracle: Map[String, String] = Map(
    "q253_fd_discovery" ->
      s"""WITH stacked AS (
           $fdStackSql),
         g AS (
           SELECT lhs, rhs, xv,
             CAST(count(DISTINCT yv) AS BIGINT) AS ndv_y
           FROM stacked GROUP BY 1, 2, 3)
         SELECT lhs, rhs, count(*) AS n_groups,
           CAST(sum(CASE WHEN ndv_y > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(max(ndv_y) AS BIGINT) AS max_rhs_ndv,
           CAST(CASE WHEN sum(CASE WHEN ndv_y > 1 THEN 1 ELSE 0 END) = 0
             THEN 1 ELSE 0 END AS BIGINT) AS holds
         FROM g GROUP BY 1, 2""",

    "q254_key_discovery" ->
      s"""WITH stacked AS (
           $keyStackSql),
         h AS (
           SELECT combo, v, count(*) AS m FROM stacked GROUP BY 1, 2)
         SELECT combo, CAST(sum(m) AS BIGINT) AS n_rows,
           count(*) AS n_distinct,
           CAST(sum(m) - count(*) AS BIGINT) AS n_extra_rows,
           CAST(max(m) AS BIGINT) AS max_multiplicity,
           CAST(CASE WHEN sum(m) = count(*) THEN 1 ELSE 0 END AS BIGINT)
             AS is_key
         FROM h GROUP BY combo""")
}
