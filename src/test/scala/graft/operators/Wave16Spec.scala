package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-16 operators (q202–q206), each pinned against
  * an independent sequential reference at sf0.001; the DuckDB oracle
  * separately hash-checks exact values at the gate SFs.
  */
class Wave16Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  // ---- q202 -----------------------------------------------------------

  test("q202 replace-chain equals a per-token greedy BPE apply on every doc") {
    // same merge table the query uses
    val merges = q("q191_bpe_merges").orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2)))
    def greedy(ts: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < ts.length) {
        if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) {
          out += s"$a~$b"; i += 2
        } else { out += ts(i); i += 1 }
      }
      out.result()
    }
    val want = graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val ts0 = r.getString(1).toLowerCase.split(" ")
          .filter(_.nonEmpty).toVector
        val tsN = merges.foldLeft(ts0) { case (ts, (a, b)) => greedy(ts, a, b) }
        (r.getLong(0), (ts0.length.toLong, tsN.length.toLong,
          (ts0.length - tsN.length).toLong))
      }.toMap
    val got = q("q202_bpe_apply").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
    assert(got.values.map(_._3).sum > 0, "merges must fire somewhere")
  }

  // ---- q203 -----------------------------------------------------------

  test("q203 matches a sequential winsorize per group") {
    val vals = graft.Tables.table(spark, sf, "orders")
      .join(graft.Tables.table(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        floor(col("o_totalprice") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val want = vals.map { case (g, xs) =>
      val n = xs.length.toLong
      val lo = xs(((5 * (n - 1)) / 100 + 1 - 1).toInt)
      val hi = xs(((95 * (n - 1)) / 100 + 1 - 1).toInt)
      val clipped = xs.map(x => math.min(math.max(x, lo), hi))
      (g, (n, lo, hi, clipped.sum, xs.count(x => x < lo || x > hi).toLong))
    }
    val got = q("q203_winsorized_stats").collect()
      .map(r => r.getInt(0).toLong -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
  }

  // ---- q204 -----------------------------------------------------------

  test("q204 endpoint-sweep overlap join equals the brute-force pair scan") {
    // reference islands per user
    val ev = graft.Tables.table(spark, sf, "events")
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ivs = ev.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var s = -1L; var e = -1L
      sorted.foreach { case (_, t, _) =>
        if (s < 0) { s = t; e = t + 1800000000000L }
        else if (t > e) { out += ((u, s, e)); s = t; e = t + 1800000000000L }
        else e = math.max(e, t + 1800000000000L)
      }
      if (s >= 0) out += ((u, s, e))
      out
    }.toArray
    val want = (for {
      a <- ivs if a._1 % 20 == 0
      b <- ivs if a._1 < b._1 && a._2 < b._3 && b._2 < a._3
    } yield ((a._1, b._1),
      math.min(a._3, b._3) - math.max(a._2, b._2)))
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val got = q("q204_interval_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  // ---- q205 -----------------------------------------------------------

  test("q205 credit split matches a sequential attribution scan") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        math.floor(r.getDouble(4) * 100).toLong))
    val clicksBy = ev.filter(_._4 == "click").groupBy(_._1)
    val credits = scala.collection.mutable
      .Map.empty[Long, (Long, Long)].withDefaultValue((0L, 0L))
    ev.filter(_._4 == "purchase").foreach { case (u, _, pt, _, cents) =>
      val touched = clicksBy.getOrElse(u, Array.empty)
        .filter(c => c._3 > pt - 604800000000000L && c._3 <= pt)
      touched.foreach { c =>
        val (np, cc) = credits(c._2)
        credits(c._2) = (np + 1, cc + cents / touched.length)
      }
    }
    val got = q("q205_linear_attribution").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == credits.toMap)
    assert(got.nonEmpty)
  }

  // ---- q206 -----------------------------------------------------------

  test("q206 counts distinct sensitive bands per quasi-identifier group") {
    val rows = graft.Tables.table(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        math.floor(r.getDouble(2) / 1000.0).toLong))
    val want = rows.groupBy(_._1).map { case (k, vs) =>
      (k, (vs.length.toLong, vs.map(_._2).distinct.length.toLong))
    }
    val got = q("q206_l_diversity").collect()
      .map(r => ((r.getInt(0).toLong, r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (n, l)) =>
      assert(got(k) == ((n, l, l >= 3)))
    }
  }
}
