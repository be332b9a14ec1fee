package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HLL approx-distinct: engine-specific values can't be oracle-hashed,
  * so bound the relative error against the exact count here. */
class ApproxSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("approx-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("approx_count_distinct within 5% of exact") {
    val r = RelationalOps.queries("q60_approx_distinct")(
      spark, "/root/testdata/sf0.001").head()
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(exact > 0)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
