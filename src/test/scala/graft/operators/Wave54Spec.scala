package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-54 governance composites (q295–q296); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave54Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q295 flag rollup partitions the corpus; flags agree with the " +
      "individual signals") {
    val got = graft.SparkEntry.queries("q295_dedup_method_agreement")(
      spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getLong(3)))
    val nDocs = graft.Tables.table(spark, sf, "documents").count()
    assert(got.map(_._4).sum == nDocs)
    // Combinations are unique (a partition, not overlapping counts).
    assert(got.map(t => (t._1, t._2, t._3)).distinct.length == got.length)
    // Cross-check each marginal against its signal computed directly.
    val exact = graft.Tables.table(spark, sf, "documents")
      .selectExpr("md5(text) AS th").groupBy("th").count()
      .filter("count > 1")
      .selectExpr("CAST(coalesce(sum(count), 0) AS LONG)")
      .collect()(0).getLong(0)
    assert(got.filter(_._1).map(_._4).sum == exact)
    val near = TextOps.verifiedJaccardPairs(spark, sf)
      .filter("jac_ppm >= 500000")
      .selectExpr("explode(array(a_id, b_id)) AS d").distinct().count()
    assert(got.filter(_._2).map(_._4).sum == near)
  }

  test("q296 restatement matches a sequential recompute and sums to " +
      "the final total") {
    val rows = graft.Tables.table(spark, sf, "events")
      .selectExpr("ts div 86400000000000 AS day", "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ckpt = rows.map(_._2).max / 2
    val want = rows.groupBy(_._1).map { case (day, g) =>
      val atCk = g.filter(_._2 <= ckpt).map(_._3).sum
      val fin = g.map(_._3).sum
      val late = g.count(_._2 > ckpt).toLong
      (day, atCk, fin, late, (fin - atCk) * 1000000L / fin)
    }.toSet
    val got = graft.SparkEntry.queries("q296_restatement_audit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
  }
}
