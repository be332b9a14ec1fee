package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Differential for the native CDC chunker (q223): cdc_chunks(text)
  * must equal the relational cut/zip_with formulation it replaced
  * (embedded verbatim below and in CdcChunks' scaladoc) on every
  * input shape — short docs (no interior window), empty text, long
  * repetitive text (many cuts), and non-ASCII text where char
  * positions diverge from byte offsets.
  */
class CdcChunksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private val relational =
    """zip_with(cuts,
         concat(slice(cuts, 2, size(cuts) - 1), array(len + 1)),
         (st, en) -> substring(text, st, en - st))"""

  private val cutsSql =
    """array_sort(concat(array(1),
         filter(sequence(2, greatest(2, len - 3)),
           i -> i <= len - 3 AND
             CAST(conv(substring(md5(substring(text, i, 4)), 1, 4),
                  16, 10) AS BIGINT) % 37 = 0)))"""

  test("cdc_chunks equals the relational cut formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      "",
      "a",
      "abcd",
      "abcdefg",
      "the quick brown fox jumps over the lazy dog " * 40,
      "ababababab" * 100,
      ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
        "sed do eiusmod tempor incididunt ut labore ") * 25,
      // non-ASCII: multi-byte chars shift byte offsets off char
      // positions; chunk *content* must still match substring() chars
      "héllo wörld ünïcode çhunking tëst " * 30,
      "日本語のテキストで確認する必要があります " * 20,
      "mixed ascii and 中文 characters répéated often " * 25
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("len", length(col("text")))
      .withColumn("cuts", expr(cutsSql))
    val rows = docs
      .select(col("doc_id"),
        expr(relational).as("want"),
        expr("cdc_chunks(text)").as("got"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val want = r.getSeq[String](1)
      val got = r.getSeq[String](2)
      assert(got == want, s"doc ${r.getLong(0)}")
    }
  }
}
