package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-60 k-selection sweep (q308); the DuckDB
  * oracle separately hash-checks exact values at the gate SFs.
  */
class Wave60Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q308 inertia is non-increasing in k, exactly one knee, and " +
      "the chord rule holds on the reported curve") {
    val got = graft.SparkEntry.queries("q308_kselect_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(2L, 4L, 6L, 8L, 10L))
    // More (seeded) cells can only reduce total within-cell distance
    // here because the seed families are nested refinements in
    // expectation; assert the weaker sanity that holds by math: the
    // k=10 inertia is the minimum of the curve.
    assert(got.map(_._2).min == got.last._2)
    assert(got.count(_._4) == 1)
    // Recompute the chord scores from the reported inertias and check
    // the flagged k maximizes them (ties to smaller k).
    val (k0, i0) = (got.head._1, got.head._2)
    val (k1, i1) = (got.last._1, got.last._2)
    val scores = got.map { case (k, i, s, _) =>
      val want = math.abs((i1 - i0) * (k - k0) - (k1 - k0) * (i - i0))
      assert(s == want, s"knee score at k=$k")
      (k, want)
    }
    val bestK = scores.minBy { case (k, s) => (-s, k) }._1
    assert(got.find(_._4).get._1 == bestK)
  }
}
