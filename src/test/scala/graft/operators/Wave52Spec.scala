package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-52 operators (q290–q292) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave52Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q290 generalization ladder matches a sequential recompute " +
      "and is monotone up the lattice") {
    val rows = graft.Tables.table(spark, sf, "events")
      .selectExpr("event_type", "(ts div 86400000000000 + 4) % 7 AS dow")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def audit(key: ((String, Long)) => String, level: String) = {
      val g = rows.groupBy(key).map(_._2.length.toLong).toSeq
      val supp = g.filter(_ < 10).sum
      (level, g.size.toLong, g.min, supp * 1000000L / g.sum, g.min >= 10)
    }
    val want = Set(
      audit(r => s"${r._1}|${r._2}", "L0_type_dow"),
      audit(r => s"${r._1}|${if (r._2 == 0 || r._2 == 6) "we" else "wd"}",
        "L1_type_weekend"),
      audit(_._1, "L2_type"),
      audit(_ => "*", "L3_all"))
    val got = graft.SparkEntry.queries("q290_k_anon_generalization")(
      spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == want)
    // Generalizing can only grow the smallest group.
    val kByLevel = got.map(t => t._1 -> t._3).toMap
    assert(kByLevel("L0_type_dow") <= kByLevel("L1_type_weekend"))
    assert(kByLevel("L1_type_weekend") <= kByLevel("L2_type"))
    assert(kByLevel("L2_type") <= kByLevel("L3_all"))
  }

  test("q291 threshold sweep is monotone non-increasing and grid-complete") {
    val got = graft.SparkEntry.queries("q291_dedup_threshold_sweep")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 9L).map(_ * 100000L))
    // Raising the cutoff can only shrink both counts.
    got.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3)
    }
    // The loosest cutoff must agree with a direct count over the
    // verified candidate pairs.
    val pairs = TextOps.lshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.head._2 <= pairs.length)
    assert(got.head._3 <= pairs.flatMap(p => Seq(p._1, p._2)).distinct.size)
  }

  test("q292 MRR@10 matches a sequential recompute") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .selectExpr("source", "doc_id", "CAST(n_chars AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val per = docs.groupBy(_._1).map { case (src, g) =>
      val ranked = g.sortBy(x => (-x._3, x._2)).take(10)
      val first = ranked.zipWithIndex
        .find { case (x, _) => x._3 >= 400 }
        .map(_._2 + 1L).getOrElse(0L)
      (src, first, if (first > 0) 1000000L / first else 0L)
    }.toSet
    val want = per +
      (("__all__", 0L, per.toSeq.map(_._3).sum / per.size))
    val got = graft.SparkEntry.queries("q292_mrr_at_10")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want)
  }
}
