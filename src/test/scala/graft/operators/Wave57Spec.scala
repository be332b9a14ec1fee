package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-57 operators (q302–q303); the DuckDB oracle
  * separately hash-checks exact values at the gate SFs.
  */
class Wave57Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q302 segmentation matches a sequential recompute") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val blocks = toks.zipWithIndex
        .groupBy(_._2 / 20).view.mapValues(_.map(_._1).toSet).toMap
      val nb = blocks.keys.max
      val seams = (0 until nb).map { b =>
        val a = blocks(b); val c = blocks(b + 1)
        val inter = (a & c).size.toLong
        inter * 1000000L / (a.size + c.size - inter)
      }
      if (seams.isEmpty) None
      else {
        val sum = seams.sum
        val n = seams.size.toLong
        Some((id, n, seams.count(j => 2 * n * j < sum).toLong,
          seams.min, sum / n))
      }
    }.toSet
    val got = graft.SparkEntry.queries("q302_texttiling_segmentation")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q303 Theil-Sen matches a sequential recompute and shrugs off " +
      "an outlier that moves the mean slope") {
    val rows = graft.Tables.table(spark, sf, "events")
      .selectExpr("event_type", "ts div 86400000000000 AS day",
        "CAST(floor(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val want = rows.groupBy(_._1).map { case (tpe, g) =>
      val daily = g.groupBy(_._2).map { case (d, h) =>
        (d, h.map(_._3).sum) }.toSeq.sortBy(_._1)
      val pairs = for {
        (d1, r1) <- daily; (d2, r2) <- daily if d1 < d2
      } yield (floorDiv((r2 - r1) * 1000000L, d2 - d1), d1, d2)
      val sorted = pairs.sortBy(p => (p._1, p._2, p._3))
      val n = sorted.size.toLong
      (tpe, n, sorted(((n + 1) / 2 - 1).toInt)._1)
    }.toSet
    val got = graft.SparkEntry.queries("q303_theil_sen_trend")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want)
    // Robustness: the median of pairwise slopes ignores a single
    // inflated day that doubles the arithmetic-mean slope.
    val daily = rows.filter(_._1 == "purchase").groupBy(_._2)
      .map { case (d, h) => (d, h.map(_._3).sum) }.toSeq.sortBy(_._1)
    val bumped = daily.updated(daily.size / 2,
      (daily(daily.size / 2)._1, daily(daily.size / 2)._2 * 100))
    def tsSlope(ser: Seq[(Long, Long)]): Long = {
      val ps = (for {
        (d1, r1) <- ser; (d2, r2) <- ser if d1 < d2
      } yield floorDiv((r2 - r1) * 1000000L, d2 - d1)).sorted
      ps(((ps.size + 1) / 2 - 1))
    }
    val base = tsSlope(daily)
    val withOutlier = tsSlope(bumped)
    val spread = daily.map(_._2).max * 1000000L / daily.size
    assert(math.abs(withOutlier - base) < spread,
      "Theil-Sen moved disproportionately under one outlier")
  }
}
