package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-87 information-theoretic tests (q361–q362);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave87Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q361 matches a sequential chi-square grid recompute; " +
    "residuals sum to ~0 per language") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nn = BigInt(docs.length)
    val rl = docs.groupBy(_._1).map { case (l, g) => l -> BigInt(g.length) }
    val cs = docs.groupBy(_._2).map { case (s0, g) =>
      s0 -> BigInt(g.length)
    }
    val obs = docs.groupBy(identity).map { case (k, g) =>
      k -> BigInt(g.length)
    }
    val expected = (for {
      (l, r) <- rl.toSeq; (s0, c) <- cs.toSeq
      o = obs.getOrElse((l, s0), BigInt(0))
      diff = o * nn - r * c
    } yield (l, s0, o.toLong, r.toLong, c.toLong,
      (diff * diff * 1000000 / (r * c * nn)).toLong,
      (diff * 1000000 / (r * c)).toLong)).toSet
    val got = graft.SparkEntry
      .queries("q361_lang_source_independence")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // Per language, Σ_cells (o·N − r·c) = 0 exactly, so the signed
    // residuals roughly cancel (truncation leaves < |cells| ppm).
    got.groupBy(_._1).foreach { case (_, g) =>
      val s = g.toSeq.map(t => t._7.toDouble * t._4 * t._5).sum
      assert(math.abs(s) / (nn.toDouble * nn.toDouble) < 1.0)
    }
  }

  test("q362 matches a sequential entropy recompute; rollup equals " +
    "the per-state sum") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { g =>
      val s0 = g.sortBy(t => (t._2, t._3)).map(_._4).toSeq
      s0.sliding(2).filter(_.size == 2).map(w => (w(0), w(1)))
    }.toSeq
    val nPair = pairs.groupBy(identity)
      .map { case (k, g) => k -> g.size.toLong }
    val nCur = pairs.groupBy(_._1).map { case (c, g) => c -> g.size.toLong }
    val nn = pairs.size.toLong
    val perCur = nPair.groupBy(_._1._1).map { case (c, g) =>
      val h = g.map { case ((_, _), np) =>
        -(np * math.floor(
          math.log((1.0 * np) / nCur(c)) * 1000000).toLong) / nn
      }.sum
      (c, nCur(c), h)
    }.toSet
    val expected = perCur ++ Set(("__all__",
      perCur.toSeq.map(_._2).sum, perCur.toSeq.map(_._3).sum))
    val got = graft.SparkEntry
      .queries("q362_sequence_entropy_rate")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.forall(_._3 >= 0L))
  }
}
