package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-18 operators (q210–q214) at sf0.001, each
  * against an independent sequential reference; the DuckDB oracle
  * separately hash-checks exact values at the gate SFs.
  */
class Wave18Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def docs(): Array[(Long, Long, Array[String])] =
    graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).toLowerCase.split(" ").filter(_.nonEmpty)))

  private def segsOf(t: Array[String]): Array[String] =
    t.grouped(3).map(_.mkString(" ")).toArray

  test("q210 repetition signals match a sequential per-doc recompute " +
      "and the keep gate splits the corpus") {
    val want = docs().filter(_._3.length >= 10).map { case (id, nc, t) =>
      val grams = t.sliding(2).map(_.mkString(" ")).toSeq
      val (gCnt, gTop) = grams.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
        .map { case (g, c) => (c, g) }.max
      val (wCnt, _) = t.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
        .map { case (w, c) => (c, w) }.max
      val segs = segsOf(t)
      val dup = segs.groupBy(identity).values.map(_.size - 1L).sum
      val top2 = gCnt * gTop.length * 1000000L / nc
      val topw = wCnt * 1000000L / t.length
      val dups = dup * 1000000L / segs.length
      id -> ((top2, topw, dups,
        if (top2 <= 100000 && topw <= 110000 && dups == 0) 1L else 0L))
    }.toMap
    val got = q("q210_gopher_repetition").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    val keeps = got.values.map(_._4).toSeq
    assert(keeps.contains(1L) && keeps.contains(0L),
      "the gate should genuinely split the corpus")
  }

  test("q211 within-doc dedup matches a sequential keep-first pass and " +
      "drops at least one repeated segment corpus-wide") {
    val want = docs().filter(_._3.nonEmpty).map { case (id, _, t) =>
      val segs = segsOf(t)
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      segs.foreach(seen += _)
      id -> ((segs.length.toLong, seen.size.toLong, seen.mkString(" ")))
    }.toMap
    val got = q("q211_withindoc_dedup").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == want)
    assert(got.values.exists(v => v._2 < v._1),
      "at least one doc should actually lose a repeated segment")
  }

  test("q212 banded median/MAD match a sequential per-source recompute") {
    val bySource = graft.Tables.table(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1) / 10))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted(((xs.size + 1) / 2 - 1).toInt)
    }
    val want = bySource.map { case (src, bands) =>
      val med = lowerMedian(bands)
      val devs = bands.map(b => math.abs(b - med))
      val mad = lowerMedian(devs)
      src -> ((bands.size.toLong, med, mad,
        devs.count(_ > 3 * mad).toLong))
    }
    val got = q("q212_mad_outliers").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
  }

  test("q213 bins equal a sequential next-fit packing and cover every " +
      "file exactly once") {
    val files = docs().map { case (id, nc, _) => (id, nc) }.sortBy(_._1)
    var cum = 0L
    val want = files.map { case (id, b) =>
      val bin = cum / 4000; cum += b; (bin, id, b)
    }.groupBy(_._1).map { case (bin, rows) =>
      bin -> ((rows.length.toLong, rows.map(_._3).sum,
        rows.map(_._2).min, rows.map(_._2).max))
    }
    val got = q("q213_compaction_plan").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == files.length.toLong)
    // every bin except possibly the last holds >= target bytes worth of
    // START positions, i.e. bins are contiguous in doc order
    val bins = got.keys.toSeq.sorted
    assert(bins == (bins.min to bins.max))
  }

  test("q214 conflicts match a sequential first-committer-wins scan") {
    val commits = graft.Tables.table(spark, sf, "orders")
      .filter("o_orderkey % 10 = 0")
      .selectExpr("o_orderkey", "o_orderkey % 8",
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 1000",
        "CAST(floor(o_totalprice) AS BIGINT) % 604800")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(2) + r.getLong(3)))
    val want = commits.flatMap { case (ck, part, s, c) =>
      val n = commits.count { case (ck2, part2, _, c2) =>
        part2 == part && ck2 != ck && c2 > s && c2 <= c
      }
      if (n > 0) Some((ck, part, n.toLong)) else None
    }.groupBy(_._2).map { case (part, rows) =>
      part -> ((rows.length.toLong, rows.map(_._3).sum, rows.map(_._3).max))
    }
    val got = q("q214_occ_conflicts").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    assert(got == want)
  }
}
