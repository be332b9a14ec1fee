package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-42 operators (q268–q270) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave42Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .select("event_id", "ts", "event_type", "user_id", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
      r.getDouble(4)))

  test("q268 Simpson audit matches a sequential recompute") {
    val pts = events.map { case (_, ts, tpe, _, v) =>
      (tpe, (ts / 3600000000000L) % 24,
        math.floor(v * 100 + 0.5).toLong)
    }
    def num(g: Seq[(String, Long, Long)]): Long = {
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(p => p._2 * p._3).sum
      n * sxy - sx * sy
    }
    val pooled = num(pts.toSeq)
    val want = pts.groupBy(_._1).map { case (tpe, g) =>
      val sn = num(g.toSeq)
      (tpe, g.length.toLong, sn, pooled,
        if ((sn < 0) != (pooled < 0) && sn != 0 && pooled != 0) 1L
        else 0L)
    }.toSet
    val got = graft.SparkEntry.queries("q268_simpson_audit")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
  }

  test("q269 Benford audit matches a sequential recompute") {
    val exp = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
    val digits = events
      .map(e => math.floor(e._5 * 100 + 0.5).toLong)
      .filter(_ > 0)
      .map(_.toString.head.asDigit)
    val n = digits.length.toLong
    val want = digits.groupBy(identity).map { case (d, g) =>
      val obs = g.length.toLong
      val obsPpm = obs * 1000000L / n
      val diff = obsPpm - exp(d)
      (d.toLong, obs, obsPpm, exp(d), diff * diff / exp(d))
    }.toSet
    val got = graft.SparkEntry.queries("q269_benford_audit")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
  }

  test("q270 RLE advisor matches a sequential storage-order scan") {
    val ordered = events.sortBy(_._1)
    def runs[T](vs: Seq[T]): Long =
      1L + vs.zip(vs.tail).count { case (a, b) => a != b }
    val n = ordered.length.toLong
    val want = Set(
      ("event_type", runs(ordered.map(_._3).toSeq)),
      ("user_id", runs(ordered.map(_._4).toSeq)),
      ("cents", runs(ordered.map(e => math.floor(e._5 * 100 + 0.5).toLong)
        .toSeq)),
      ("day", runs(ordered.map(_._2 / 86400000000000L).toSeq)))
      .map { case (c, r) => (c, r, n, r * 1000000L / n) }
    val got = graft.SparkEntry.queries("q270_rle_advisor")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }
}
