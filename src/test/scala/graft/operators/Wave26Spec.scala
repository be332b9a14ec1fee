package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-26 operator (q240) against an independent
  * sequential walk; the DuckDB oracle separately hash-checks exact
  * values at the gate SFs.
  */
class Wave26Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h13(v: Long): Long =
    java.lang.Long.parseLong(md5hex(v.toString).take(13), 16)

  test("q240 walks match a sequential deterministic walk") {
    val li = graft.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = graft.Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val und = li.flatMap { case (ok, sk) =>
      val a = ord(ok) * 2; val b = sk * 2 + 1
      Seq((a, b), (b, a))
    }.distinct
    val adj = und.groupBy(_._1).map { case (n, g) =>
      n -> g.map(_._2).distinct.sorted
    }
    def walk(start: Long): (Long, Long, Long) = {
      var cur = start
      val steps = (1 to 3).map { t =>
        val nb = adj(cur)
        cur = nb((h13(start * 10 + t) % nb.length).toInt)
        cur
      }
      (steps(0), steps(1), steps(2))
    }
    val want = adj.keys.filter(_ % 2 == 0).map { s =>
      val (n1, n2, n3) = walk(s); (s, n1, n2, n3)
    }.toSet
    val got =
      graft.SparkEntry.queries("q240_random_walks")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(got == want)
    // Every step follows an actual edge.
    val edgeSet = und.toSet
    assert(got.forall { case (s, n1, n2, n3) =>
      edgeSet((s, n1)) && edgeSet((n1, n2)) && edgeSet((n2, n3))
    })
  }
}
