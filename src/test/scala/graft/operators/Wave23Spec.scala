package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-23 operators (q232–q234) against independent
  * sequential references; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave23Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h13(v: Long): Long =
    java.lang.Long.parseLong(md5hex(v.toString).take(13), 16)

  private lazy val events: Array[(Long, Long)] =
    graft.Tables.table(spark, sf, "events")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100).toLong))

  test("q232 percentile ranks match a sequential strictly-below count") {
    val n = events.length.toLong
    val sortedC = events.map(_._2).sorted
    val want = events.map { case (id, c) =>
      val below = sortedC.count(_ < c).toLong
      (id, c, below * 1000000L / n)
    }.toSet
    val got = q("q232_percentile_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // percentile of the global min is 0; of a max-value row, < 1e6.
    assert(got.exists(_._3 == 0L))
    assert(got.forall(_._3 < 1000000L))
  }

  test("q233 kappa matches the textbook 2x2 computation") {
    val flags = graft.Tables.table(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
      .map(t => (t.length >= 300,
        t.count(_ == ' ') + 1 >= 55))
    val n = flags.length.toLong
    val n11 = flags.count(f => f._1 && f._2).toLong
    val n10 = flags.count(f => f._1 && !f._2).toLong
    val n01 = flags.count(f => !f._1 && f._2).toLong
    val n00 = flags.count(f => !f._1 && !f._2).toLong
    val po = (n11 + n00) * 1000000L / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) *
      1000000L / (n * n)
    val kappa = (po - pe) * 1000000L / (1000000L - pe)
    val Seq(row) = q("q233_filter_kappa").collect().toSeq
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7)) ==
      ((n, n11, n10, n01, n00, po, pe, kappa)))
  }

  test("q234 bootstrap replicates match a sequential hash resample") {
    val means = (0L until 20L).map { rep =>
      val ws = events.map { case (id, c) =>
        val u = h13(id * 20 + rep) % 1000000L
        val w = if (u < 367879) 0L else if (u < 735759) 1L
          else if (u < 919699) 2L else if (u < 981012) 3L
          else if (u < 996340) 4L else 5L
        (w, w * c)
      }
      ws.map(_._2).sum / ws.map(_._1).sum
    }
    val bootMean = means.sum / 20L
    val bootVar = means.map(m => (m - bootMean) * (m - bootMean)).sum / 20L
    val Seq(row) = q("q234_poisson_bootstrap").collect().toSeq
    val idx = row.schema.fieldNames.zipWithIndex.toMap
    assert(row.getLong(idx("n_reps")) == 20L)
    assert(row.getLong(idx("boot_mean")) == bootMean)
    assert(row.getLong(idx("boot_var")) == bootVar)
    assert(row.getLong(idx("rep_min")) == means.min)
    assert(row.getLong(idx("rep_max")) == means.max)
    assert(row.getLong(idx("n")) == events.length.toLong)
    assert(row.getLong(idx("mean_cents")) ==
      events.map(_._2).sum / events.length)
    // The error bar is non-degenerate: replicates differ.
    assert(means.distinct.length > 1)
  }
}
