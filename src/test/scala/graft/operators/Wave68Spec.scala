package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-68 basket mining + streaming burst twin
  * (q323–q324); the DuckDB oracle separately hash-checks exact values
  * at the gate SFs.
  */
class Wave68Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q323 streaming burst equals batch q317 exactly") {
    val batch = graft.SparkEntry.queries("q317_burst_detection")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val stream = graft.SparkEntry.queries("q323_stream_burst")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(stream == batch && stream.nonEmpty)
  }

  test("q324 matches a sequential basket-mining recompute") {
    val items = graft.Tables.table(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nB = items.map(_._1).distinct.length.toLong
    val cnt = items.groupBy(_._2).map { case (p, g) =>
      p -> g.length.toLong
    }
    val byOrder = items.groupBy(_._1).values
    val pairCnt = byOrder.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- ps.indices if ps(i) < ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
    val top = pairCnt.toSeq.sortBy(t => (-t._2, t._1._1, t._1._2))
      .take(20)
    val expected = top.map { case ((p1, p2), pc) =>
      val c1 = cnt(p1); val c2 = cnt(p2)
      (p1, p2, pc, c1, c2, pc * 1000000L / nB, pc * 1000000L / c1,
        pc * 1000000L / c2, pc * nB * 1000000L / (c1 * c2))
    }.toSet
    val got = graft.SparkEntry
      .queries("q324_basket_association_rules")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
      .toSet
    assert(got == expected && got.size == 20)
    // Lift is symmetric in its inputs and positive.
    assert(got.forall(_._9 > 0L))
  }
}
