package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: stub decode/frames/features run through real
  * mapPartitions batch processing with pinned deterministic outputs.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private val sf = "/root/testdata/sf0.001"

  test("decode stub is deterministic and length-derived") {
    assert(MultimodalOps.decodeStub("abcd".getBytes) ==
      (64 + 4, 64 + (4 * 31) % 577, 1 + 4 % 7))
    val rows = MultimodalOps.decoded(spark, sf)
    val r = rows.orderBy("asset_id").head()
    val n = r.getInt(1)
    assert(r.getInt(2) == 64 + n % 577)
    assert(r.getInt(3) == 64 + (n * 31) % 577)
    assert(r.getInt(4) == 1 + n % 7)
  }

  test("frame sampling emits decode-stub frame counts with content hashes") {
    val f = MultimodalOps.frames(spark, sf)
    val perAsset = f.groupBy("asset_id").count()
    val joined = MultimodalOps.decoded(spark, sf)
      .select(col("asset_id"), col("n_frames"))
      .join(perAsset, "asset_id")
      .filter(col("n_frames").cast("long") =!= col("count"))
    assert(joined.count() == 0)
    assert(f.filter(not(col("frame_hash").rlike("^[0-9a-f]{32}$")))
      .count() == 0)
  }

  test("feature vectors are 8-wide with exact-in-float values") {
    val f = MultimodalOps.features(spark, sf).head()
    val vec = f.getSeq[Float](1)
    assert(vec.length == 8)
    assert(vec.forall(v => v >= 0f && v < 1f))
    // value k derives from byte k*7 of the payload: exact c/128.
    assert(vec.forall(v => (v * 128f) == (v * 128f).toInt.toFloat))
  }
}
