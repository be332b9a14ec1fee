package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** KmvSketch aggregator contract: the bounded-state sketch returns
  * exactly the k-th smallest distinct hash — the same order statistic
  * as the composable distinct→TakeOrdered plan — and is independent of
  * partitioning (merge is commutative/associative and dedups).
  */
class KmvSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private val k = 64

  private def hashes = {
    import spark.implicits._
    // duplicated keys: each value appears up to 3 times
    (1L to 5000L).flatMap(i => Seq.fill((i % 3 + 1).toInt)(i))
      .toDF("key")
      .select(conv(substring(md5(col("key").cast("string")), 1, 13), 16, 10)
        .cast("long").as("hv"))
  }

  test("sketch k-th min equals distinct+TakeOrdered k-th min") {
    val expected = hashes.distinct().orderBy("hv").limit(k)
      .agg(max("hv")).head().getLong(0)
    val agg = udaf(new KmvSketch(k))
    val got = hashes.agg(agg(col("hv"))).head().getLong(0)
    assert(got == expected)
  }

  test("sketch result is partition-count independent") {
    val agg = udaf(new KmvSketch(k))
    val r1 = hashes.repartition(1).agg(agg(col("hv"))).head().getLong(0)
    val r7 = hashes.repartition(7).agg(agg(col("hv"))).head().getLong(0)
    assert(r1 == r7)
  }

  test("fewer than k distinct values -> largest retained hash, so the " +
    "(k-1)/u estimator degrades gracefully") {
    import spark.implicits._
    // with m < k distinct the state is the exact distinct set; finish
    // must return max(h) — the same order statistic an oracle computing
    // max over `ORDER BY hv LIMIT k` yields — not a sentinel that
    // collapses the estimate to ~0 (ADVICE r3)
    val small = (1L to 10L).toDF("hv")
    val agg = udaf(new KmvSketch(k))
    val got = small.agg(agg(col("hv"))).head().getLong(0)
    assert(got == 10L)
  }

  test("empty input -> Long.MaxValue (estimate ~0)") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("hv")
    val agg = udaf(new KmvSketch(k))
    val got = empty.agg(agg(col("hv"))).head().getLong(0)
    assert(got == Long.MaxValue)
  }
}
