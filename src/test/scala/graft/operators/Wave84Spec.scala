package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-84 incremental-maintenance operators
  * (q355–q356). The DuckDB oracles are FULL recomputes, so the gate
  * hash-match already certifies the delta rules; these specs re-prove
  * it in-engine and pin the selectivity property that makes the
  * maintenance worth running.
  */
class Wave84Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q355 incremental view equals the in-engine full recompute") {
    val direct = graft.Tables.table(spark, sf, "orders")
      .select(col("o_custkey").as("ck"),
        col("o_orderpriority").as("prio"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("oc"))
      .join(graft.Tables.table(spark, sf, "customer").select(
        col("c_custkey").cast("long").as("ck"),
        expr("""CAST(floor(c_acctbal * 100) AS BIGINT)
            + CASE WHEN c_custkey % 7 = 0 THEN 1000 ELSE 0 END""")
          .as("bal")), "ck")
      .groupBy("prio")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("oc + bal")).as("measure_cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val incremental = graft.SparkEntry
      .queries("q355_join_view_ivm")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(incremental == direct && incremental.nonEmpty)
  }

  test("q356 checksums equal the in-engine full recompute, and the " +
    "re-scan is genuinely selective") {
    val li = graft.Tables.table(spark, sf, "lineitem").select(
      col("l_partkey").as("pk"), col("l_orderkey").as("ok"),
      expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("pc"))
    val direct = li.filter(col("ok") % 11 =!= 0)
      .groupBy("pk").agg(min("pc").as("mn"))
      .select((col("pk") % 64).as("bucket"),
        (col("mn") % 1000000007L).as("res"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), (sum("res") % 1000000007L).as("ck"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = graft.SparkEntry
      .queries("q356_min_maintenance_deletes")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.map(t => (t._1, t._2, t._3)).toSet == direct)
    val (unt, surv, inv) = (got.head._4, got.head._5, got.head._6)
    val nGroups = li.select("pk").distinct().count()
    assert(unt + surv + inv == nGroups)
    // Selectivity: the delete batch invalidates only a strict subset
    // of groups — the whole point of selective re-aggregation.
    assert(inv > 0L && inv < nGroups)
  }
}
