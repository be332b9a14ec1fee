package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-21 operators (q224–q227) against independent
  * sequential references; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave21Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String, dir: String = sf) =
    graft.SparkEntry.queries(name)(spark, dir)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h13(v: Long): Long =
    java.lang.Long.parseLong(md5hex(v.toString).take(13), 16)

  test("q224 LOO encoding matches a sequential pass and excludes self") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100).toLong))
    val byCat = ev.groupBy(_._2)
    val want = ev.flatMap { case (id, cat, c) =>
      val g = byCat(cat)
      if (g.length > 1)
        Some((id, cat, c,
          math.floorDiv(g.map(_._3).sum - c, g.length - 1L)))
      else None
    }.toSet
    val got = q("q224_loo_target_encoding").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // A constant-value category would encode to that constant; here,
    // every row's encoding differs from the naive category mean
    // whenever its own cents differ from the mean — spot-check one.
    assert(got.nonEmpty)
  }

  test("q225 folds are a pure function of user (zero leakage)") {
    val got = q("q225_group_kfold").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ev = graft.Tables.table(spark, sf, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fold = ev.map(_._1).distinct.map(u => u -> h13(u) % 5).toMap
    val want = ev.groupBy { case (u, t) => (fold(u), t) }.map {
      case ((f, t), rows) =>
        (f, t, rows.length.toLong, rows.map(_._1).distinct.length.toLong)
    }.toSet
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSet == want)
    // share_ppm sums to ~1e6 within each fold.
    for ((f, rows) <- got.groupBy(_._1)) {
      val s = rows.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - rows.length, s"fold $f: $s")
    }
  }

  test("q226 drift bins cover all rows and chi2 is exact") {
    val rows = q("q226_drift_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 10)
    assert(rows.map(_._1).sorted.toSeq == (0L to 9L))
    val n = graft.Tables.table(spark, sf, "events").count()
    assert(rows.map(r => r._2 + r._3).sum == n) // every event binned once
    for ((_, _, _, p, qq, chi) <- rows)
      assert(chi == (qq - p) * (qq - p) / math.max(p, 1L))
  }

  test("q227 keeps exactly the minority count per class, by hash rank") {
    val e = graft.Tables.table(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val target = e.groupBy(_._2).values.map(_.size).min.toLong
    val want = e.groupBy(_._2).map { case (lab, g) =>
      val kept = g.sortBy(x => (h13(x._1), x._1)).take(target.toInt)
      (lab, g.length.toLong, target, kept.map(_._1).sum)
    }.toSet
    val got = q("q227_class_balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }
}
