package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-33 operator (q248) against an independent
  * sequential planning pass; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave33Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h13(v: Long): Long =
    java.lang.Long.parseLong(md5hex(v.toString).take(13), 16)

  test("q248 range plan matches a sequential sample-and-count pass") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100).toLong))
    val sample = ev.map { case (id, c) => (h13(id), id, c) }
      .sortBy(x => (x._1, x._2)).take(256).map(_._3).sorted
    val splits = (1 to 7).map(i => sample(i * 32 - 1))
    val buckets = ev.map { case (_, c) =>
      splits.count(_ <= c).toLong
    }
    val n = ev.length.toLong
    val want = buckets.groupBy(identity).map { case (b, g) =>
      (b, g.length.toLong, g.length.toLong * 8L * 1000000L / n)
    }.toSet
    val got = graft.SparkEntry.queries("q248_range_plan")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // every row lands in exactly one of the P buckets
    assert(got.toSeq.map(_._2).sum == n)
    assert(got.forall(x => x._1 >= 0 && x._1 <= 7))
  }
}
