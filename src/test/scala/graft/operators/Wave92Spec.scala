package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-92 model-feature diagnostics (q371–q372);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave92Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q371 matches a sequential Fisher recompute") {
    val e = graft.Tables.table(spark, sf, "embeddings")
      .selectExpr("CAST(label AS BIGINT)",
        "transform(embedding, x -> CAST(floor(x * 1000000) AS BIGINT))")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val dims = e.head._2.length
    val expected = (0 until dims).map { d =>
      val byLbl = e.groupBy(_._1).map { case (_, g) =>
        val xs = g.map(_._2(d))
        (BigInt(xs.length), xs.map(BigInt(_)).sum,
          xs.map(x => BigInt(x) * x).sum)
      }.toSeq
      val nn = byLbl.map(_._1).sum
      val sxt = byLbl.map(_._2).sum
      val between = byLbl.map { case (n, sx, _) =>
        val diff = sx * nn - n * sxt
        diff * diff / (n * nn * nn)
      }.sum
      val within = byLbl.map { case (n, sx, sxx) =>
        sxx - sx * sx / n
      }.sum
      (d.toLong, nn.toLong,
        (between * 1000000 / within.max(BigInt(1))).toLong)
    }.toSet
    val got = graft.SparkEntry
      .queries("q371_fisher_separability")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected && got.size == dims)
  }

  test("q372 matches a sequential uplift recompute; top decile leads " +
    "the cumulative curve") {
    val rows = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts", "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = rows.map(_._2).min; val t1 = rows.map(_._2).max
    val mid = t0 + (t1 - t0) / 2
    val users = rows.groupBy(_._1).map { case (u, g) =>
      (u, g.filter(_._2 < mid).map(_._3).sum,
        g.filter(_._2 >= mid).map(_._3).sum, u % 2)
    }.toSeq
    val xs = users.map(_._2).sorted
    val n = xs.length.toLong
    val cuts = (1 to 9).map { j =>
      xs.find(v => xs.count(_ <= v) * 10 >= n * j).get
    }.distinct.sorted
    // NOTE: the query counts thresholds from the full 9-cut list
    val cuts9 = (1 to 9).map { j =>
      xs.find(v => xs.count(_ <= v) * 10 >= n * j).get
    }
    val byDec = users.groupBy(u => 1 + cuts9.count(u._2 >= _))
    val up = byDec.toSeq.flatMap { case (dec, g) =>
      val t = g.filter(_._4 == 1); val c = g.filter(_._4 == 0)
      if (t.isEmpty || c.isEmpty) None
      else Some((dec.toLong, t.size.toLong, c.size.toLong,
        t.map(_._3).sum * 1000000L / t.size -
          c.map(_._3).sum * 1000000L / c.size))
    }.sortBy(-_._1)
    val cum = up.scanLeft(0L)(_ + _._4).drop(1)
    val expected = up.zip(cum).map { case ((d, nt, nc, u), cu) =>
      (d, nt, nc, u, cu)
    }.toSet
    val got = graft.SparkEntry.queries("q372_uplift_deciles")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }
}
