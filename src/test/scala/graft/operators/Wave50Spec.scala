package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-50 operators (q282–q285) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave50Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .select("event_id", "ts", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      math.floor(r.getDouble(3) * 100).toLong))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q282 confusion matrix is a partition of each label's vectors " +
      "and reproducible across shuffle widths") {
    val got = graft.SparkEntry.queries("q282_centroid_confusion")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // Row sums per true label == that label's vector count.
    val labelCounts = graft.Tables.table(spark, sf, "embeddings")
      .groupBy("label").count().collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1))).toMap
    // .toSeq before summing: mapping a Set collapses duplicate counts.
    val rowSums = got.groupBy(_._1).map { case (l, rs) =>
      l -> rs.toSeq.map(_._3).sum
    }
    assert(rowSums == labelCounts)
    // Floored ppm shares per label sum to within P of 1e6.
    got.groupBy(_._1).foreach { case (_, rs) =>
      val s = rs.toSeq.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rs.size)
    }
    // Predicted labels come from the label alphabet.
    assert(got.map(_._2).subsetOf(labelCounts.keySet))
    // Same answer under a different shuffle width (argmin ties and
    // centroid means must not depend on partitioning).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    val again = graft.SparkEntry.queries("q282_centroid_confusion")(s2, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(again == got)
  }

  test("q283 Brier decomposition matches a sequential recompute") {
    val cents = events.map(_._4)
    val pos = events.map(t => if (t._3 == "purchase") 1L else 0L)
    val m = cents.max
    val nAll = cents.length.toLong
    val posAll = pos.sum
    val want = cents.zip(pos).groupBy { case (c, _) => c / (m / 10 + 1) }
      .map { case (bin, g) =>
        val n = g.length.toLong
        val nPos = g.map(_._2).sum
        val sumP = g.map { case (c, _) => c * 1000000L / (m + 1) }.sum
        val pbar = sumP / n
        val obar = nPos * 1000000L / n
        val obarG = posAll * 1000000L / nAll
        (bin, n, pbar, obar,
          n * (pbar - obar) * (pbar - obar) / (nAll * 1000000L),
          n * (obar - obarG) * (obar - obarG) / (nAll * 1000000L))
      }.toSet
    val got = graft.SparkEntry.queries("q283_brier_decomposition")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
  }

  test("q284 t-closeness matches a sequential recompute") {
    val rows = events.map { case (_, ts, tpe, c) =>
      (tpe, (ts / 86400000000000L + 4) % 7, c)
    }
    val m = rows.map(_._3).max
    val cls = rows.map { case (t, d, c) => (t, d, c / (m / 10 + 1)) }
    val nAll = cls.length.toLong
    val byCls = cls.groupBy(_._3).map { case (k, g) => k -> g.length.toLong }
    val want = cls.groupBy(r => (r._1, r._2)).map { case ((t, d), g) =>
      val nG = g.length.toLong
      val byC = g.groupBy(_._3).map { case (k, h) => k -> h.length.toLong }
      var cum = 0L
      var tSum = 0L
      (0L until 11L).foreach { c =>
        cum += byC.getOrElse(c, 0L) * 1000000L / nG -
          byCls.getOrElse(c, 0L) * 1000000L / nAll
        tSum += math.abs(cum)
      }
      (t, d, nG, tSum / 10)
    }.toSet
    val got = graft.SparkEntry.queries("q284_t_closeness")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
  }

  test("q285 conformal coverage matches a sequential recompute") {
    def half(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(13), 16) % 2
    val cal = events.filter(e => half(e._1) == 0)
    val test = events.filter(e => half(e._1) == 1)
    val pred = cal.groupBy(_._3).map { case (t, g) =>
      t -> g.map(_._4).sum / g.length
    }
    val resid = cal.map(e => math.abs(e._4 - pred(e._3))).sorted
    val k = (9 * (resid.length + 1L) + 9) / 10
    val qhat = resid((k - 1).toInt)
    val covRows = test.map(e => (e._3, math.abs(e._4 - pred(e._3)) <= qhat))
    val per = covRows.groupBy(_._1).map { case (t, g) =>
      val n = g.length.toLong
      val c = g.count(_._2).toLong
      (t, n, c, c * 1000000L / n)
    }.toSet
    val nT = covRows.length.toLong
    val cT = covRows.count(_._2).toLong
    val want = per + (("__all__", nT, cT, cT * 1000000L / nT))
    val got = graft.SparkEntry.queries("q285_conformal_coverage")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    // The split-conformal guarantee itself: overall coverage >= ~90%
    // (distribution-free, so it must hold on any corpus modulo the
    // finite-sample wobble the +1 in k already absorbs).
    assert(cT * 1000000L / nT >= 880000L)
  }
}
