package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the wave-29 operator (q243) against an independent
  * sequential leave-one-source-out recompute (including the naive
  * per-source re-scan the single-pass form must equal); the DuckDB
  * oracle separately hash-checks exact values at the gate SFs.
  */
class Wave29Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def tokens(t: String): Array[String] =
    t.toLowerCase.split(" ").filter(_.nonEmpty)

  test("q243 LOSO equals the naive per-source re-scan") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tokBySrc = docs.groupBy(_._1).map { case (s, g) =>
      s -> g.map(d => tokens(d._2).length.toLong)
    }
    val vocabBySrc = docs.groupBy(_._1).map { case (s, g) =>
      s -> g.flatMap(d => tokens(d._2)).toSet
    }
    val tDocs = docs.length.toLong
    val tTok = tokBySrc.values.flatten.sum
    val want = tokBySrc.map { case (s, toks) =>
      val nDocs = toks.length.toLong
      val sumTok = toks.sum
      // the NAIVE LOSO: recompute the mean over every other source
      val others = tokBySrc.filter(_._1 != s).values.flatten
      val loso = others.sum / others.size
      val delta = (loso - tTok / tDocs) * 1000000L / (tTok / tDocs)
      val uniq = (vocabBySrc(s) --
        vocabBySrc.filter(_._1 != s).values.flatten.toSet).size.toLong
      (s, nDocs, sumTok, sumTok / nDocs, loso, delta, uniq)
    }.toSet
    val got = graft.SparkEntry.queries("q243_loso_valuation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want)
    // unique-token counts sum to the tokens owned by exactly 1 source
    val allVocab = vocabBySrc.values.flatten.groupBy(identity)
    assert(got.toSeq.map(_._7).sum ==
      allVocab.count(_._2.size == 1).toLong)
  }
}
