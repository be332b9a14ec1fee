package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-66 feed-health monitors (q319–q320); the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave66Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q319 matches a sequential drift recompute; shares sum to ~1e6") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("event_type", "ts", "props IS NULL").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val t0 = ev.map(_._2).min; val t1 = ev.map(_._2).max
    val mid = t0 + (t1 - t0) / 2
    val totA = ev.count(_._2 < mid).toLong
    val totB = ev.count(_._2 >= mid).toLong
    val expected = ev.groupBy(_._1).map { case (t, g) =>
      val cntA = g.count(_._2 < mid).toLong
      val cntB = g.count(_._2 >= mid).toLong
      val nullA = g.count(e => e._2 < mid && e._3).toLong
      val nullB = g.count(e => e._2 >= mid && e._3).toLong
      val shA = cntA * 1000000L / totA
      val shB = cntB * 1000000L / totB
      (t, cntA, cntB, shA, shB, shB - shA,
        if (cntA == 0) 0L else nullA * 1000000L / cntA,
        if (cntB == 0) 0L else nullB * 1000000L / cntB,
        if (cntA == 0) "new" else if (cntB == 0) "gone" else "common")
    }.toSet
    val got = graft.SparkEntry
      .queries("q319_category_drift_audit")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getString(8)))
      .toSet
    assert(got == expected && got.nonEmpty)
    val sumA = got.toSeq.map(_._4).sum
    assert(sumA > 999990L && sumA <= 1000000L)
  }

  test("q320 outliers are the true top-20 by own-centroid distance") {
    val e = graft.Tables.table(spark, sf, "embeddings")
      .selectExpr("vec_id", "CAST(label AS BIGINT)",
        "transform(embedding, x -> CAST(x AS DOUBLE))").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray))
    val cents = e.groupBy(_._2).map { case (l, g) =>
      val dim = g.head._3.length
      l -> Array.tabulate(dim) { i =>
        BigDecimal(g.map(_._3(i)).sum / g.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val scored = e.map { case (id, l, v) =>
      val c = cents(l)
      val d2 = BigDecimal(dot(v, v) - 2 * dot(v, c) + dot(c, c))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, l, d2)
    }
    val expected = scored.sortBy(t => (-t._3, t._1)).take(20)
      .map(t => (t._1, t._2)).toSeq
    val got = graft.SparkEntry
      .queries("q320_embedding_outlier_scan")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }
}
