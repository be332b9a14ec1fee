package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition-independence differentials for the hash-seeded operators
  * whose README claim is "bit-identical under any partitioning":
  * the same query must produce the identical row set under different
  * shuffle-partition counts (different hash fan-out, different merge
  * orders, different window partition layouts). Covers the Poisson
  * bootstrap (q234), the random-walk corpus (q240), the A-priori
  * pairs (q242), and the class-balanced sample (q227) — the four
  * where a partitioning-dependent bug would silently change the
  * SAMPLE/CORPUS a downstream job trains on, not just a metric.
  * The round-5 second session adds the md5-policy replay (q273), the
  * rank-transform quantile matcher (q267, order-sensitive windows +
  * slab join), and the clamped balance (q261, per-user window state).
  */
class PartitionReproSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def rows(name: String, parts: Int): Set[String] = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", parts)
    graft.SparkEntry.queries(name)(s2, sf).collect()
      .map(_.mkString("\u0000")).toSet
  }

  for (q <- Seq("q234_poisson_bootstrap", "q240_random_walks",
      "q242_copurchase_pairs", "q227_class_balance",
      "q273_bandit_replay", "q267_quantile_match",
      "q261_clamped_balance")) {
    test(s"$q is identical under 4, 7 and 13 shuffle partitions") {
      val base = rows(q, 4)
      assert(base.nonEmpty)
      assert(rows(q, 7) == base)
      assert(rows(q, 13) == base)
    }
  }
}
