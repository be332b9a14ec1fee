package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-32 operator (q247) against an independent
  * sequential Pareto computation; the DuckDB oracle separately
  * hash-checks exact values at the gate SFs.
  */
class Wave32Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q247 Pareto heads match a sequential concentration scan") {
    val li = graft.Tables.table(spark, sf, "lineitem")
      .select("l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    val sup = graft.Tables.table(spark, sf, "supplier")
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val rev = li.groupBy(_._1).map { case (sk, g) =>
      (sup(sk), sk, (g.map(_._2).sum * 100).toLongExact)
    }.toSeq
    val want = rev.groupBy(_._1).map { case (nat, g) =>
      val ordered = g.sortBy(x => (-x._3, x._2))
      val total = ordered.map(_._3).sum
      var cum = 0L
      val flags = ordered.map { x =>
        val inHead = cum * 1000000L / total < 800000L
        cum += x._3
        (x._3, inHead)
      }
      val headCents = flags.filter(_._2).map(_._1).sum
      (nat, ordered.length.toLong, flags.count(_._2).toLong,
        headCents * 1000000L / total, total)
    }.toSet
    val got = graft.SparkEntry.queries("q247_pareto_heads")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // the head always covers at least 80% (with near-uniform toy
    // revenue the head can be the whole set — the ≥ bound is the
    // distribution-free invariant)
    assert(got.forall(_._4 >= 800000L))
  }
}
