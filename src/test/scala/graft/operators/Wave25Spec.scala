package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-25 operators (q238–q239) against independent
  * sequential references; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave25Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q238 per-slice AUC equals the pairwise definition per slice") {
    val seg = graft.Tables.table(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.Tables.table(spark, sf, "orders")
      .select("o_custkey", "o_totalprice", "o_orderstatus").collect()
      .map(r => (seg(r.getLong(0)),
        math.floor(r.getDouble(1) * 100).toLong,
        r.getString(2) == "F"))
    val want = rows.groupBy(_._1).flatMap { case (slice, g) =>
      val pos = g.filter(_._3).map(_._2)
      val neg = g.filterNot(_._3).map(_._2)
      if (pos.isEmpty || neg.isEmpty) None
      else {
        val u2 = (for (p <- pos; n <- neg) yield {
          if (p > n) 2L else if (p == n) 1L else 0L
        }).sum
        Some((slice, pos.length.toLong, neg.length.toLong, u2,
          u2 * 1000000L / (2L * pos.length * neg.length)))
      }
    }.toSet
    val got = q("q238_sliced_auc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.size == 5) // all five market segments have both classes
  }

  test("q239 NDCG matches a sequential ranked-list computation") {
    val w = Seq(1000000L, 630930L, 500000L, 430677L, 386853L, 356207L,
      333333L, 315465L, 301030L, 289065L)
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def rel(nChars: Long): Long =
      if (nChars >= 400) 2L else if (nChars >= 200) 1L else 0L
    val want = docs.groupBy(_._1).flatMap { case (src, g) =>
      val model = g.sortBy(d => (-d._3, d._2)).take(10)
      val ideal = g.sortBy(d => (-rel(d._3), d._2)).take(10)
      val dcg = model.zipWithIndex.map { case (d, i) => rel(d._3) * w(i) }.sum
      val idcg = ideal.zipWithIndex.map { case (d, i) => rel(d._3) * w(i) }.sum
      if (idcg == 0) None
      else Some((src, dcg, idcg, dcg * 1000000L / idcg))
    }.toSet
    val got = q("q239_ndcg_at_10").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // NDCG is at most 1e6, attained when the model order IS ideal.
    assert(got.forall(_._4 <= 1000000L))
  }
}
