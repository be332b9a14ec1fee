package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-69 segmentation operators (q325–q326); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave69Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q325 matches a sequential trigram recompute") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tris = ev.groupBy(_._1).values.flatMap { g =>
      val sortedTypes = g.sortBy(t => (t._2, t._3)).map(_._4).toSeq
      sortedTypes.sliding(3).filter(_.size == 3).map(w =>
        (w(0), w(1), w(2)))
    }.toSeq
    val cnt = tris.groupBy(identity)
      .map { case (t, g) => (t, g.size.toLong) }
    val nTri = tris.size.toLong
    val expected = cnt.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
      .map { case ((a, b, c), n) =>
        (a, b, c, n, n * 1000000L / nTri)
      }.toSet
    val got = graft.SparkEntry.queries("q325_path_trigrams")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.size == 20)
  }

  test("q326 matches a sequential RFM recompute; segments stay in " +
    "the 111..555 lattice") {
    val orders = graft.Tables.table(spark, sf, "orders")
      .selectExpr("o_custkey",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')",
        "CAST(floor(o_totalprice * 100) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val maxDd = orders.map(_._2).max
    val cust = orders.groupBy(_._1).map { case (ck, g) =>
      (ck, (maxDd - g.map(_._2).max).toLong, g.size.toLong,
        g.map(_._3).sum / 100)
    }.toSeq
    def thresholds(vs: Seq[Long]): Seq[Long] = {
      val h = vs.groupBy(identity).map { case (v, g) =>
        (v, g.size.toLong)
      }.toSeq.sortBy(_._1)
      val n = vs.size.toLong
      val cum = h.scanLeft(0L)(_ + _._2).drop(1)
      (1 to 4).map { j =>
        h(cum.indexWhere(c => c * 5 >= n * j))._1
      }
    }
    val rT = thresholds(cust.map(_._2))
    val fT = thresholds(cust.map(_._3))
    val mT = thresholds(cust.map(_._4))
    def sc(v: Long, t: Seq[Long]): Long = 1L + t.count(v >= _)
    val segs = cust.map { case (_, r, f, m) =>
      (sc(r, rT) * 100 + sc(f, fT) * 10 + sc(m, mT), m)
    }
    val nAll = segs.size.toLong
    val expected = segs.groupBy(_._1).map { case (s, g) =>
      (s, g.size.toLong, g.map(_._2).sum / g.size,
        g.size.toLong * 1000000L / nAll)
    }.toSet
    val got = graft.SparkEntry.queries("q326_rfm_segmentation")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.forall { t =>
      val s = t._1
      s >= 111 && s <= 555 &&
        (s / 100) >= 1 && (s / 100) <= 5 &&
        (s / 10 % 10) >= 1 && (s / 10 % 10) <= 5 &&
        (s % 10) >= 1 && (s % 10) <= 5
    })
  }
}
