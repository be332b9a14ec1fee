package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-17 operators (q207–q209) at sf0.001, each
  * against an independent sequential reference; the DuckDB oracle
  * separately hash-checks exact values at the gate SFs.
  */
class Wave17Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q207 matches a sequential mod/rendezvous movement count, and " +
      "rendezvous moves far less than mod") {
    val ids = graft.Tables.table(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val modMoved = ids.count { id =>
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(13), 16)
      h % 16 != h % 20
    }.toLong
    def hrwWinner(id: Long, n: Int): Int =
      (0 until n).maxBy(s => md5hex(s"$id#$s"))
    val hrwMoved = ids.count(id => hrwWinner(id, 16) != hrwWinner(id, 20))
      .toLong
    val got = q("q207_shard_rebalance").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val n = ids.length.toLong
    assert(got("mod") == ((n, modMoved, modMoved * 1000000L / n)))
    assert(got("rendezvous") == ((n, hrwMoved, hrwMoved * 1000000L / n)))
    // the consistent-hashing property this audit exists to demonstrate
    assert(hrwMoved * 3 < modMoved,
      s"rendezvous ($hrwMoved) should move far less than mod ($modMoved)")
  }

  test("q208 datasheet totals match a sequential per-source scan") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3).toLowerCase.split(" ").count(_.nonEmpty).toLong))
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val quality = rows.count { case (_, _, ch, tk) =>
        val m = ch * 1000 / tk; m >= 3000 && m <= 10000
      }.toLong
      (src, (rows.length.toLong, rows.map(_._4).sum, rows.map(_._3).sum,
        rows.map(_._2).distinct.length.toLong, quality,
        quality * 1000000L / rows.length))
    }
    val got = q("q208_dataset_card").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == want)
  }

  test("q209 centroid products match a sequential vector aggregation") {
    val rows = graft.Tables.table(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1000).toLong)))
    val byLabel = rows.groupBy(_._1)
    val cent = byLabel.view.mapValues { vs =>
      val dims = vs.head._2.length
      (Array.tabulate(dims)(i => vs.map(_._2(i)).sum), vs.length.toLong)
    }.toMap
    val want = (for {
      a <- cent.keys; b <- cent.keys if a < b
      (sa, na) = cent(a); (sb, nb) = cent(b)
    } yield ((a, b), (sa.zip(sb).map { case (x, y) => x * y }.sum,
      sa.map(x => x * x).sum, sb.map(x => x * x).sum, na, nb))).toMap
    val got = q("q209_centroid_products").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
