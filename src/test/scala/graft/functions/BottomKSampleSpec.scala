package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BottomKSample contract: the sample is EXACTLY the values of the k
  * smallest-hash rows (a pure function of the input set), independent of
  * partitioning, and quantiles read from it land within sampling error
  * of the true quantiles.
  */
class BottomKSampleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private val k = 64

  // value = id cast to double: true quantiles are known in closed form
  private def rows = {
    import spark.implicits._
    (1L to 20000L).map(i => (i, i.toDouble)).toDF("id", "v")
      .withColumn("hv",
        conv(substring(md5(col("id").cast("string")), 1, 13), 16, 10)
          .cast("long"))
  }

  private def sampler =
    udaf(new BottomKSample(k), ExpressionEncoder[(Long, Double)]())

  test("sample == brute-force bottom-k values, sorted") {
    val got = rows.agg(sampler(col("hv"), col("v")))
      .head().getSeq[Double](0)
    val expected = rows.orderBy("hv").limit(k)
      .select("v").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got == expected)
    assert(got.length == k)
  }

  test("sample is partition-count independent") {
    val r1 = rows.repartition(1).agg(sampler(col("hv"), col("v")))
      .head().getSeq[Double](0)
    val r7 = rows.repartition(7).agg(sampler(col("hv"), col("v")))
      .head().getSeq[Double](0)
    assert(r1 == r7)
  }

  test("median over the sample is within sampling error of the truth") {
    val sample = rows.agg(sampler(col("hv"), col("v")))
      .head().getSeq[Double](0)
    val est = sample(sample.length / 2)
    // true median 10000.5; uniform-sample standard error ~ n/(2*sqrt(k))
    assert(math.abs(est - 10000.5) < 20000.0 / math.sqrt(k.toDouble),
      s"median estimate $est too far from 10000.5")
  }

  test("fewer than k rows -> the sample is the whole (sorted) input") {
    import spark.implicits._
    val small = (1L to 10L).map(i => (i, (11 - i).toDouble))
      .toDF("id", "v")
      .withColumn("hv", col("id") * 7919L % 101L)
    val got = small.agg(sampler(col("hv"), col("v")))
      .head().getSeq[Double](0)
    assert(got == (1L to 10L).map(_.toDouble))
  }
}
