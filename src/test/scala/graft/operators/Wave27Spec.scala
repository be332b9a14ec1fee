package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-27 operator (q241) against an independent
  * sequential skip-gram expansion over the (already spec-checked)
  * q240 walk corpus; the DuckDB oracle separately hash-checks exact
  * values at the gate SFs.
  */
class Wave27Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h13(v: Long): Long =
    java.lang.Long.parseLong(md5hex(v.toString).take(13), 16)

  test("q241 pairs + negatives match a sequential expansion") {
    val walks = graft.SparkEntry.queries("q240_random_walks")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val vocab = walks.flatMap(w => Seq(w._1, w._2, w._3, w._4))
      .distinct.sorted
    val want = walks.flatMap { case (wid, n1, n2, n3) =>
      val seq = Array(wid, n1, n2, n3)
      for {
        i <- 0 to 3
        j <- math.max(0, i - 2) to math.min(3, i + 2)
        if j != i
      } yield {
        val neg = vocab((h13(wid * 100 + i * 10 + j) %
          vocab.length).toInt)
        (wid, i.toLong, j.toLong, seq(i), seq(j), neg)
      }
    }.toSet
    val got = graft.SparkEntry.queries("q241_skipgram_pairs")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    // 10 pairs per walk: positions 0..3, window ±2 (distance-3 pair
    // excluded in both directions).
    assert(got.size == walks.length * 10)
  }
}
