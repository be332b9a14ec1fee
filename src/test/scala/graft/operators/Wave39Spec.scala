package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-39 operators (q263–q264) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave39Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q263 TextRank matches a sequential two-round recompute") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
      .map(_.toLowerCase.split(" ").filter(_.nonEmpty).toSeq)
      .filter(_.length >= 2)
    val counts = docs.flatten.groupBy(identity).view
      .mapValues(_.length).toMap
    val vocab = counts.filter(_._2 >= 20).keySet
    val wt = docs.flatMap(t => t.zip(t.tail))
      .filter { case (a, b) => a != b && vocab(a) && vocab(b) }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val edges = wt.toSeq.flatMap { case ((u, v), w) =>
      Seq((u, v, w), (v, u, w))
    }
    val wdeg = edges.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    var rank: Map[String, Long] = wdeg.keys.map(_ -> 1000000L).toMap
    (1 to 2).foreach { _ =>
      val inflow = edges.flatMap { case (s0, d0, w) =>
        rank.get(s0).map(r => d0 -> r * w / wdeg(s0))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = inflow.view.mapValues(m => 150000L + m * 85 / 100).toMap
    }
    val want = rank.toSeq.sortBy { case (w, r) => (-r, w) }.take(25)
    val got = graft.SparkEntry.queries("q263_textrank_keywords")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("q264 embedding drift matches a sequential recompute") {
    val rows = graft.Tables.table(spark, sf, "embeddings")
      .selectExpr("CAST(label AS BIGINT)", "CAST(vec_id % 2 AS BIGINT)",
        "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1000).toLong)))
    val want = rows.map(_._1).distinct.map { lbl =>
      val byHalf = (0 to 1).map { h =>
        val vs = rows.filter(r => r._1 == lbl && r._2 == h).map(_._3)
        val dims = vs.head.indices.map(i => vs.map(_(i)).sum)
        (vs.length.toLong, dims)
      }
      val (n0, s0) = byHalf(0); val (n1, s1) = byHalf(1)
      val dot = s0.zip(s1).map { case (a, b) => a * b }.sum
      val nn0 = s0.map(x => x * x).sum
      val nn1 = s1.map(x => x * x).sum
      val cos = BigDecimal(dot.toDouble / math.sqrt(nn0.toDouble * nn1.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lbl, n0, n1, dot, cos)
    }.toSet
    val got = graft.SparkEntry.queries("q264_embedding_drift")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(got == want)
    // cosine bounds hold; NOTE the synthetic embeddings are near
    // zero-mean per label, so the half-centroids are noise-dominated
    // and their agreement is legitimately low — the monitor reports
    // it rather than assuming healthy data
    assert(got.forall(r => r._5 >= -1.0 && r._5 <= 1.0))
  }
}
