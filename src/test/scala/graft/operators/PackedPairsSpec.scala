package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The packed-long pair key is injective only below 2^31 per item id;
  * the helper must enumerate exactly the C(k,2) upper-triangle pairs in
  * packed order for legal ids and FAIL (not corrupt) past the bound.
  */
class PackedPairsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.shuffle.partitions", "2")
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("enumerates every in-basket pair, packed and order-preserving") {
    val df = spark.sql(
      "SELECT array(2L, 5L, 9L) AS items UNION ALL SELECT array(1L, 3L)")
    val got = df.select(explode(PackedPairs.packedUpperPairs("items"))
      .as("pk")).collect().map(_.getLong(0)).sorted
    val want = Seq((2L, 5L), (2L, 9L), (5L, 9L), (1L, 3L))
      .map { case (a, b) => a * 4294967296L + b }.sorted
    assert(got.toSeq == want)
  }

  test("largest legal id packs; 2^31 raises instead of corrupting") {
    val ok = spark.sql("SELECT array(1L, 2147483647L) AS items")
      .select(explode(PackedPairs.packedUpperPairs("items")).as("pk"))
    assert(ok.collect().map(_.getLong(0)).toSeq ==
      Seq(1L * 4294967296L + 2147483647L))
    val bad = spark.sql("SELECT array(1L, 2147483648L) AS items")
      .select(explode(PackedPairs.packedUpperPairs("items")).as("pk"))
    val e = intercept[Exception](bad.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("corrupt packed pair keys")))
  }
}
