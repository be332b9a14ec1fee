package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ApproxSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("native HLL approx_count_distinct within 5% of exact") {
    val r = graft.Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
      .agg(approx_count_distinct(col("l_orderkey"), 0.01),
        countDistinct(col("l_orderkey"))).head()
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(exact > 0)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  // KMV stderr is ~1/sqrt(k-2) ≈ 12.7% at k=64; 3σ bound.
  test("q60 KMV estimate within 40% of exact") {
    val r = RelationalOps.queries("q60_approx_distinct")(
      spark, "/root/testdata/sf0.001").head()
    val exact = r.getLong(0).toDouble
    val est = r.getDouble(1)
    assert(exact > 0)
    assert(math.abs(est - exact) / exact < 0.40,
      s"kmv=$est exact=$exact")
  }
}
