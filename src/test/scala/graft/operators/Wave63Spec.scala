package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-63 linkage / rank-agreement operators
  * (q313–q314); the DuckDB oracle separately hash-checks exact values
  * at the gate SFs.
  */
class Wave63Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private case class Cust(k: Long, nm: String, seg: String, nat: Long,
    bb: Long)

  private lazy val custs: Seq[Cust] = graft.Tables
    .table(spark, sf, "customer")
    .selectExpr("CAST(c_custkey AS BIGINT)", "c_name", "c_mktsegment",
      "CAST(c_nationkey AS BIGINT)",
      "CAST(floor(c_acctbal * 100) AS BIGINT) div 100000")
    .collect()
    .map(r => Cust(r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getLong(4)))
    .toSeq

  test("q313 matches a sequential Fellegi-Sunter recompute") {
    val a = custs.filter(_.k % 19 != 0)
      .map(c => (c.k, c.nat, c.nm, c.seg, c.bb))
    val b = custs.filter(_.k % 17 != 0).map { c =>
      val nm = if (c.k % 13 == 0) c.nm.toLowerCase else c.nm
      val seg = if (c.k % 7 == 0) "UNKNOWN" else c.seg
      val bb = c.bb + (if (c.k % 11 == 0) 1L else 0L)
      (c.k, c.nat, nm, seg, bb)
    }
    def num[T](fa: Seq[T], fb: Seq[T]): Long = {
      val ga = fa.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
      val gb = fb.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
      ga.toSeq.map { case (v, n) => n * gb.getOrElse(v, 0L) }.sum
    }
    val den = a.size.toLong * b.size
    def w(numF: Long): (Long, Long) = (
      math.floor(math.log((19.0 * den) / (20.0 * numF)) * 1000000).toLong,
      math.floor(math.log((1.0 * den) / (20.0 * (den - numF))) * 1000000)
        .toLong)
    val (wnP, wnN) = w(num(a.map(_._3), b.map(_._3)))
    val (wsP, wsN) = w(num(a.map(_._4), b.map(_._4)))
    val (wbP, wbN) = w(num(a.map(_._5), b.map(_._5)))
    val expected = (for {
      x <- a; y <- b if x._2 == y._2
      nAg = if (x._3 == y._3) 1L else 0L
      sAg = if (x._4 == y._4) 1L else 0L
      bAg = if (x._5 == y._5) 1L else 0L
      score = nAg * wnP + (1 - nAg) * wnN + sAg * wsP + (1 - sAg) * wsN +
        bAg * wbP + (1 - bAg) * wbN
      if score > 0
    } yield (x._1, y._1, nAg, sAg, bAg, score,
      if (x._1 == y._1) 1L else 0L)).toSet
    val got = graft.SparkEntry
      .queries("q313_fellegi_sunter_linkage")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // The FS property the weights exist for: at least one TRUE match
    // whose name disagrees (the lowercased 1/13) still links on
    // segment+balance evidence alone.
    assert(got.exists(t => t._7 == 1L && t._3 == 0L))
  }

  test("q314 matches a sequential Kendall-tau recompute and stays in " +
    "[-1e6, 1e6]") {
    val ords = graft.Tables.table(spark, sf, "orders")
      .selectExpr("CAST(o_custkey AS BIGINT)").collect()
      .map(_.getLong(0)).groupBy(identity)
      .map { case (k, g) => k -> g.length.toLong }
    val cents = graft.Tables.table(spark, sf, "customer")
      .selectExpr("CAST(c_custkey AS BIGINT)",
        "CAST(c_nationkey AS BIGINT)",
        "CAST(floor(c_acctbal * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = cents.groupBy(_._2).flatMap { case (nat, g) =>
      val withVol = g.map(c => (c._1, c._3, ords.getOrElse(c._1, 0L)))
      val byWealth = withVol.sortBy(t => (-t._2, t._1)).take(50)
      val r1 = byWealth.zipWithIndex.map { case (t, i) => t._1 -> (i + 1) }
        .toMap
      val r2 = byWealth.sortBy(t => (-t._3, t._1)).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1) }.toMap
      val ks = byWealth.map(_._1)
      if (ks.length < 2) None
      else {
        val pairs = for {
          i <- ks.indices; j <- ks.indices if ks(i) < ks(j)
        } yield if ((r1(ks(i)) < r1(ks(j))) == (r2(ks(i)) < r2(ks(j)))) 1L
          else 0L
        val c = pairs.sum
        val n = pairs.size.toLong
        Some((nat, ks.length.toLong, c, n - c, (2 * c - n) * 1000000L / n))
      }
    }.toSet
    val got = graft.SparkEntry
      .queries("q314_kendall_rank_agreement")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.forall(t => t._5 >= -1000000L && t._5 <= 1000000L))
  }
}
