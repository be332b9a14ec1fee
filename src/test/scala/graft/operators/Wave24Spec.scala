package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-24 operators (q235–q237) against independent
  * sequential references; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave24Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def tokens(t: String): Array[String] =
    t.toLowerCase.split(" ").filter(_.nonEmpty)

  private lazy val docs: Array[(Long, String)] =
    graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("q235 padding audit matches a sequential batching simulation") {
    val want = docs.map(d => tokens(d._2).length.toLong)
      .groupBy(_ / 32).map { case (bucket, g) =>
        val nBatches = (g.length + 7) / 8
        val padded = nBatches.toLong * 8 * g.max
        (bucket, g.length.toLong, g.sum, g.max, nBatches.toLong, padded,
          (padded - g.sum) * 1000000L / padded)
      }.toSet
    val got = q("q235_padding_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want)
  }

  test("q236 zipf bins cover every token occurrence exactly once") {
    val freq = docs.flatMap(d => tokens(d._2)).groupBy(identity)
      .map { case (_, g) => g.length.toLong }
    val want = freq.groupBy(f => 64L - java.lang.Long.numberOfLeadingZeros(f))
      .map { case (bin, fs) =>
        (bin, fs.size.toLong, fs.sum, fs.min, fs.max)
      }.toSet
    val got = q("q236_zipf_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // every occurrence lands in exactly one bin
    assert(got.toSeq.map(_._3).sum ==
      docs.map(d => tokens(d._2).length.toLong).sum)
  }

  test("q237 novelty rate matches a sequential first-seen scan") {
    val pairs = docs.flatMap { case (id, t) =>
      val tok = tokens(t)
      if (tok.length < 3) Seq.empty
      else tok.sliding(3).map(s => (id / 50, s.mkString(" "))).toSeq
    }.distinct
    val firstBatch = pairs.groupBy(_._2).map { case (sh, g) =>
      sh -> g.map(_._1).min
    }
    val want = pairs.groupBy(_._1).map { case (b, g) =>
      val total = g.length.toLong
      val nNew = g.count { case (_, sh) => firstBatch(sh) == b }.toLong
      (b, total, nNew, nNew * 1000000L / total)
    }.toSet
    val got = q("q237_novelty_rate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // batch 0 is all-new by definition
    assert(got.find(_._1 == 0L).get._4 == 1000000L)
  }
}
