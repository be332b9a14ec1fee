package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-86 migration matrix and streaming
  * conformance twin (q359–q360); the DuckDB oracle separately
  * hash-checks exact values at the gate SFs.
  */
class Wave86Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q359 matches a sequential migration recompute; matrix covers " +
    "every user exactly once") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "ts", "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = ev.map(_._2).min; val t1 = ev.map(_._2).max
    val mid = t0 + (t1 - t0) / 2
    def spend(late: Boolean): Map[Long, Long] =
      ev.filter(e => (e._2 >= mid) == late).groupBy(_._1)
        .map { case (u, g) => u -> g.map(_._3).sum }
    val s0 = spend(false); val s1 = spend(true)
    def cuts(m: Map[Long, Long]): Seq[Long] = {
      val vs = m.values.toSeq.sorted
      val n = vs.size.toLong
      val h = vs.distinct.map(v => (v, vs.count(_ == v).toLong))
      val cum = h.scanLeft(0L)(_ + _._2).drop(1)
      (1 to 4).map(j => h(cum.indexWhere(c => c * 5 >= n * j))._1)
    }
    val c0 = cuts(s0); val c1 = cuts(s1)
    def sc(v: Option[Long], c: Seq[Long]): Long =
      v.map(x => 1L + c.count(x >= _)).getOrElse(0L)
    val users = (s0.keySet ++ s1.keySet).toSeq
    val cells = users.map(u => (sc(s0.get(u), c0), sc(s1.get(u), c1)))
    val nAll = users.size.toLong
    val expected = cells.groupBy(identity).map { case ((f, t), g) =>
      (f, t, g.size.toLong, g.size.toLong * 1000000L / nAll)
    }.toSet
    val got = graft.SparkEntry
      .queries("q359_segment_migration")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    assert(got.toSeq.map(_._3).sum == nAll)
  }

  test("q360 streaming conformance equals batch q347 exactly") {
    val batch = graft.SparkEntry
      .queries("q347_contract_conformance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
      .toSet
    val stream = graft.SparkEntry
      .queries("q360_stream_conformance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
      .toSet
    assert(stream == batch && stream.size == 6)
  }
}
