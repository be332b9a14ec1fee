package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Differential for the distributed prefix-doubling suffix array (q182):
  * brute force = materialize every suffix and sort. Inputs are chosen
  * adversarially for the doubling — periodic strings keep rank ties
  * alive to depth ~length/2, identical docs make whole suffix families
  * tie across documents (only the (doc_id, pos) tie-break separates
  * them), and short docs exercise the past-the-end sentinel.
  */
class SuffixArraySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def check(docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val got = TextOps.suffixArray(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    val brute = docs
      .flatMap { case (id, t) =>
        (0 until t.length).map(i => (id, i.toLong, t.substring(i))) }
      .sortBy { case (id, pos, suf) => (suf, id, pos) }
      .zipWithIndex
      .map { case ((id, pos, _), rank) => (id, pos, rank.toLong) }
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == brute.toSeq)
  }

  test("word-like text") {
    check(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "the quick brown fox naps"))
  }

  test("periodic strings keep ties alive to depth length/2") {
    check(Seq(
      1L -> ("ab" * 40),
      2L -> ("ab" * 37 + "a"),
      3L -> ("aab" * 25)))
  }

  test("identical documents tie every suffix cross-doc") {
    check(Seq(1L -> "banana banana", 2L -> "banana banana",
      3L -> "banana"))
  }

  test("single chars and empty-adjacent shapes") {
    check(Seq(1L -> "a", 2L -> "b", 3L -> "aa"))
  }

  test("lcpRepeats finds the planted longest repeat with exact length") {
    import spark.implicits._
    val planted = "zq jxv kwp zq" // 13 chars, planted in docs 1 and 2
    val docs = Seq(
      1L -> s"alpha beta $planted gamma",
      2L -> s"delta $planted epsilon iota",
      3L -> "omicron upsilon nothing shared").toDF("doc_id", "text")
    val top = TextOps.lcpRepeats(docs).collect()
    // longest cross-adjacent repeat must be at least the planted span
    // (its two occurrences are rank-adjacent somewhere), and brute force
    // over all pairs confirms nothing longer exists
    val texts = Map(1L -> s"alpha beta $planted gamma",
      2L -> s"delta $planted epsilon iota",
      3L -> "omicron upsilon nothing shared")
    val sufs = texts.toSeq.flatMap { case (id, t) =>
      (0 until t.length).map(i => (id, i, t.substring(i))) }
    val bruteMax = (for {
      (ai, ap, as) <- sufs; (bi, bp, bs) <- sufs
      if (ai, ap) != (bi, bp)
    } yield as.zip(bs).takeWhile { case (x, y) => x == y }.length).max
    assert(top.head.getLong(4) == bruteMax)
    assert(bruteMax >= planted.length)
  }
}
