package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-45 operators (q275–q276) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave45Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q275 PMI cells match a sequential recompute") {
    val pts = graft.Tables.table(spark, sf, "events")
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), (r.getLong(1) / 3600000000000L) % 24))
    val n = pts.length.toLong
    val byType = pts.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byHour = pts.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = pts.groupBy(identity).map { case ((tpe, h), g) =>
      val nij = g.length.toLong
      val pmi = math.floor(math.log(
        (n.toDouble * nij) / (byType(tpe).toDouble * byHour(h))) * 1e6)
        .toLong
      (tpe, h, nij, pmi, nij * pmi)
    }.toSet
    val got = graft.SparkEntry.queries("q275_pmi_cells")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == want)
  }

  test("q276 vocab coverage matches a sequential recompute") {
    val toks = graft.Tables.table(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
      .flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
    val total = toks.length.toLong
    val ranked = toks.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (t, c) => (-c, t) }
    val cums = ranked.scanLeft(0L)(_ + _._2).tail
    val want = Seq(1, 3, 10, 30, 100, 300)
      .filter(_ <= ranked.length)
      .map { k =>
        val cum = cums(k - 1)
        (k.toLong, cum, total, cum * 1000000L / total)
      }.toSet
    val got = graft.SparkEntry.queries("q276_vocab_coverage")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want && got.nonEmpty)
    // coverage is monotone in k
    val sorted = got.toSeq.sortBy(_._1)
    assert(sorted.lazyZip(sorted.drop(1)).forall((a, b) => a._4 <= b._4))
  }
}
