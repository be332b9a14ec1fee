package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-51 operators (q287–q289) against independent
  * sequential recomputes; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave51Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private lazy val events = graft.Tables.table(spark, sf, "events")
    .select("event_id", "ts", "user_id", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      math.floor(r.getDouble(4) * 100).toLong))

  test("q287 PSI matches a sequential recompute") {
    val t0 = events.map(_._2).min
    val t1 = events.map(_._2).max
    val mid = t0 + (t1 - t0) / 2
    val m = events.map(_._5).max
    def psi(rows: Seq[(String, Boolean)], feature: String) = {
      val byBin = rows.groupBy(_._1)
      val tp = rows.count(!_._2).toLong
      val tq = rows.count(_._2).toLong
      byBin.map { case (bin, g) =>
        val p = g.count(!_._2) * 1000000L / tp
        val q = g.count(_._2) * 1000000L / tq
        val pc = math.max(p, 1L)
        val qc = math.max(q, 1L)
        val lr = math.floor(math.log(pc.toDouble / qc) * 1e6).toLong
        (feature, bin, p, q, (pc - qc) * lr / 1000000L)
      }.toSet
    }
    val want =
      psi(events.toSeq.map(e =>
        ((e._5 / (m / 10 + 1)).toString, e._2 >= mid)), "value_bin") ++
        psi(events.toSeq.map(e => (e._4, e._2 >= mid)), "event_type")
    val got = graft.SparkEntry.queries("q287_psi_stability")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
    // PSI contributions are non-negative by construction.
    assert(got.forall(_._5 >= 0))
  }

  test("q288 HLL estimates match HllSketch.estimate on exact registers") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = events.groupBy(_._4).map { case (tpe, g) =>
      val users = g.map(_._3).distinct
      val regs = new Array[Byte](graft.functions.HllSketch.M)
      users.foreach { u =>
        val h = java.lang.Long.parseLong(md5hex(u.toString).take(15), 16)
        val bucket = (h >>> 53).toInt
        val rest = h & ((1L << 53) - 1)
        val rho =
          if (rest == 0L) 54
          else 54 - java.lang.Long.toBinaryString(rest).length
        if (rho > regs(bucket)) regs(bucket) = rho.toByte
      }
      val est = graft.functions.HllSketch.estimate(regs)
      val n = users.length.toLong
      (tpe, est, n, math.abs(est - n) * 1000000L / n)
    }.toSet
    val got = graft.SparkEntry.queries("q288_hll_distinct")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    // Sanity: estimates within the 3-sigma band — but ONLY above the
    // raw estimator's validity floor (n > 5m/2 = 320): below it the
    // documented no-correction bias dominates (an empty group reads
    // α·m ≈ 91), which is exactly why err_ppm is an output column.
    got.foreach { case (t, est, n, _) =>
      if (n > 320)
        assert(math.abs(est - n) <= n * 0.28, s"$t: est=$est n=$n")
    }
  }

  test("q289 funnel transitions match a sequential recompute") {
    val byUser = events.groupBy(_._3)
    val pairs = byUser.values.flatMap { g =>
      val ordered = g.sortBy(e => (e._2, e._1)).map(_._4)
      ordered.zip(ordered.drop(1)).zipWithIndex.collect {
        case ((from, to), i) if i < 5 => (i + 1L, from, to)
      }
    }.toSeq
    val bySt = pairs.groupBy(_._1).map { case (st, g) => st -> g.size.toLong }
    val want = pairs.groupBy(identity).map { case ((st, f, t), g) =>
      (st, f, t, g.size.toLong, g.size * 1000000L / bySt(st))
    }.toSet
    val got = graft.SparkEntry.queries("q289_funnel_sankey")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
  }
}
