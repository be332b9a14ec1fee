package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-28 operator (q242) against an independent
  * sequential A-priori pass; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave28Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q242 pairs match a sequential a-priori computation") {
    val op = graft.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val cnt = op.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val freq = cnt.filter(_._2 >= 3).keySet
    val nOrders = op.map(_._1).distinct.length.toLong
    val pairSupport = op.filter(x => freq(x._2)).groupBy(_._1)
      .values.flatMap { basket =>
        val items = basket.map(_._2).distinct.sorted
        for (i <- items.indices; j <- i + 1 until items.length)
          yield (items(i), items(j))
      }
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .filter(_._2 >= 2)
    val want = pairSupport.map { case ((a, b), s) =>
      (a, b, s, cnt(a), cnt(b), s * nOrders * 1000000L / (cnt(a) * cnt(b)))
    }.toSet
    val got = graft.SparkEntry.queries("q242_copurchase_pairs")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    // support never exceeds either item's basket count
    assert(got.forall(x => x._3 <= x._4 && x._3 <= x._5))
  }
}
