package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-81 engagement / KWIC operators (q349–q350);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave81Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q349 equals a brute-force per-day trailing-7 distinct count") {
    val ud = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts div 86400000000000").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = ud.map(_._2).distinct.sorted
    val expected = days.map { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(t => t._2 <= d && t._2 >= d - 6)
        .map(_._1).distinct.length.toLong
      (d, dau, wau, dau * 1000000L / wau)
    }.toSet
    val got = graft.SparkEntry
      .queries("q349_dau_wau_stickiness")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // WAU >= DAU always; stickiness <= 1e6.
    assert(got.forall(t => t._3 >= t._2 && t._4 <= 1000000L))
  }

  test("q350 contexts contain the phrase and match a sequential " +
    "recompute") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)))
      .filter(_._2.length >= 3)
    val sh = docs.flatMap { case (id, t) =>
      (0 to t.length - 3).map(i =>
        (id, i.toLong, t.slice(i, i + 3).mkString(" "), t))
    }
    val (phrase, _) = sh.groupBy(_._3)
      .map { case (p, g) => (p, g.size.toLong) }.toSeq
      .minBy(t => (-t._2, t._1))
    val expected = sh.filter(_._3 == phrase).map { case (id, pos, _, t) =>
      val s0 = math.max(0, pos.toInt - 3)
      val e0 = math.min(t.length - 1, pos.toInt + 5)
      (id, pos, phrase, t.slice(s0, e0 + 1).mkString(" "))
    }.toSet
    val got = graft.SparkEntry.queries("q350_kwic_contexts")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.forall(t => t._4.contains(t._3)))
  }
}
