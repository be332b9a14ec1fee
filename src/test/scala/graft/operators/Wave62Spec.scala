package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-62 Merkle drill-down (q312); the DuckDB
  * oracle separately hash-checks exact values at the gate SFs.
  */
class Wave62Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q312 localizes exactly the differing cells of a sequential " +
      "recompute, and every emitted cell genuinely differs") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def cells(rows: Seq[(Long, String)]): Map[(Long, Long), (Long, Long)] =
      rows.map { case (id, t) =>
        java.lang.Long.parseLong(md5hex(s"$id|$t").take(13), 16)
      }.groupBy(h => (h % 64, h / 64 % 64))
        .map { case (k, hs) =>
          k -> (hs.size.toLong,
            hs.map(_ % 1000000007L).sum % 1000000007L)
        }
    val v1 = docs.filter(_._1 % 17 != 0).map { case (id, t) =>
      (id, if (id % 13 == 0) t.take(10) else t)
    }.toSeq
    val v2 = docs.filter(_._1 % 19 != 0).toSeq
    val ca = cells(v1)
    val cb = cells(v2)
    val allKeys = (ca.keySet ++ cb.keySet).toSeq
    val badL1 = allKeys.map(_._1).distinct.filter { b1 =>
      val a = ca.filter(_._1._1 == b1).values
      val b = cb.filter(_._1._1 == b1).values
      (a.map(_._1).sum, a.map(_._2).sum % 1000000007L) !=
        ((b.map(_._1).sum, b.map(_._2).sum % 1000000007L))
    }.toSet
    val want = allKeys.filter(k => badL1(k._1)).flatMap { k =>
      val (n1, c1) = ca.getOrElse(k, (0L, 0L))
      val (n2, c2) = cb.getOrElse(k, (0L, 0L))
      if (n1 != n2 || c1 != c2) Some((k._1, k._2, n1, n2, c1, c2))
      else None
    }.toSet
    val got = graft.SparkEntry.queries("q312_merkle_diff_drilldown")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.nonEmpty, "the version slices must produce real diffs")
    got.foreach { case (_, _, n1, n2, c1, c2) =>
      assert(n1 != n2 || c1 != c2)
    }
  }
}
