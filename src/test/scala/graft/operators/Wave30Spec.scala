package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-30 operator (q244) against an independent
  * sequential RFM computation; the DuckDB oracle separately
  * hash-checks exact values at the gate SFs.
  */
class Wave30Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q244 RFM matches a sequential computation") {
    import java.time.LocalDateTime
    import java.time.ZoneOffset
    val orders = graft.Tables.table(spark, sf, "orders")
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val day = r.getAs[LocalDateTime](1).toInstant(ZoneOffset.UTC)
          .toEpochMilli / 86400000L
        (r.getLong(0), day,
          BigDecimal(r.getDouble(2)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP))
      }
    val per = orders.groupBy(_._1).map { case (c, g) =>
      (c, g.map(_._2).max, g.length.toLong,
        (g.map(_._3).sum * 100).toLongExact)
    }.toSeq
    val maxDay = per.map(_._2).max
    val minDay = per.map(_._2).min
    val maxR = maxDay - minDay
    val maxF = per.map(_._3).max
    val maxM = per.map(_._4).max
    val want = per.map { case (c, last, f, m) =>
      val r = maxDay - last
      val rs = 4 - r / (maxR / 5 + 1)
      val fs = f / (maxF / 5 + 1)
      val ms = m / (maxM / 5 + 1)
      (c, r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms)
    }.toSet
    val got = graft.SparkEntry.queries("q244_rfm_features")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == want)
    // scores are 0..4 and the most recent customer scores r=4
    assert(got.forall(x => x._5 >= 0 && x._5 <= 4 &&
      x._6 >= 0 && x._6 <= 4 && x._7 >= 0 && x._7 <= 4))
    assert(got.exists(_._5 == 4))
  }
}
