package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-15 curation operators (q196–q201). Each query
  * is pinned against an independently-computed invariant or reference
  * result at sf0.001; the DuckDB oracle separately hash-checks exact
  * values at the gate SFs.
  */
class Wave15Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  // ---- q196 -----------------------------------------------------------

  test("q196 keep-first accounting: kept totals equal distinct segments") {
    val out = q("q196_segment_dedup").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"n_kept > n_segs in $r")
    }
    // independent recompute of the segment universe
    val segs = graft.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "), w => length(w) > 0).as("t"))
      .filter(size(col("t")) > 0)
      .select(posexplode(expr(
        """transform(sequence(0, int(ceil(size(t) / 20.0)) - 1),
           i -> array_join(slice(t, i * 20 + 1, 20), ' '))""")))
      .select(col("col").as("seg"))
    val totalSegs = segs.count()
    val distinctSegs = segs.distinct().count()
    assert(out.map(_.getLong(1)).sum == totalSegs)
    assert(out.map(_.getLong(2)).sum == distinctSegs,
      "keep-first must retain exactly one occurrence per distinct segment")
  }

  // ---- q197 -----------------------------------------------------------

  test("q197 retains exactly the top-20% ranks of every source") {
    val kept = q("q197_source_quantile_gate").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val perSource = graft.Tables.table(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, n) =>
      // ranks r in 1..n pass iff (r-1)*1e6 div (n-1) >= 8e5
      val want = (1L to n).count(r => (r - 1) * 1000000L / (n - 1) >= 800000L)
      assert(kept.getOrElse(src, 0) == want,
        s"source $src: kept ${kept.getOrElse(src, 0)}, want $want of $n")
    }
  }

  // ---- q198 -----------------------------------------------------------

  test("q198 matches a per-doc recompute and excludes the benchmark") {
    val out = q("q198_contamination_frac").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.nonEmpty)
    assert(out.keys.forall(_ % 97 != 0), "bench docs must not be scored")
    // independent reference: collect tokenized docs, recompute gram sets
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)))
      .filter(_._2.length >= 5)
    val gramsOf = docs.map { case (id, t) =>
      (id, t.sliding(5).map(_.mkString(" ")).toSet)
    }.toMap
    val bench = gramsOf.collect { case (id, g) if id % 97 == 0 => g }
      .foldLeft(Set.empty[String])(_ ++ _)
    gramsOf.foreach { case (id, g) =>
      if (id % 97 != 0) {
        val hit = g.count(bench.contains).toLong
        val want = (g.size.toLong, hit, hit * 1000000L / g.size)
        assert(out(id) == want, s"doc $id: got ${out(id)}, want $want")
      }
    }
  }

  // ---- q199 -----------------------------------------------------------

  test("q199 peels monotonically and every survivor meets the threshold") {
    val rows = q("q199_kcore_peel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(1L, 2L, 3L)))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._2 <= a._2 && b._3 <= a._3 },
      s"peel must be monotone non-increasing: ${rows.mkString(", ")}")
    // recompute K and check the final survivor degrees meet it
    val eo = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = eo.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val k = und.length.toLong / (2 * und.map(_._1).distinct.length)
    // reference peel to fixed point ≤ 3 rounds
    var edges = und
    var nodes = Set.empty[Long]
    (1 to 3).foreach { _ =>
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      nodes = deg.collect { case (n, d) if d >= k => n }.toSet
      edges = edges.filter(e => nodes(e._1) && nodes(e._2))
    }
    assert(rows.last._2 == nodes.size && rows.last._3 == edges.length)
  }

  // ---- q200 -----------------------------------------------------------

  test("q200 is exactly the cross-split subset of q37's candidate pairs") {
    val leaks = q("q200_split_leakage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    leaks.foreach { case (_, _, sa, sb) => assert(sa != sb) }
    val pairs = q("q37_lsh_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(leaks.forall(l => pairs((l._1, l._2))))
    // recompute the split assignment independently
    def split(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 10 match {
        case b if b < 8 => "train"
        case 8 => "valid"
        case _ => "test"
      }
    }
    val wantLeaks = pairs.filter(p => split(p._1) != split(p._2))
    assert(leaks.map(l => (l._1, l._2)).toSet == wantLeaks)
    leaks.foreach { case (a, b, sa, sb) =>
      assert(split(a) == sa && split(b) == sb)
    }
  }

  // ---- q201 / forward as-of -------------------------------------------

  test("q201 equals an independent window-composition forward attribution") {
    val got = q("q201_forward_asof").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // reference: collect both sides, scan per user
    val ev = graft.Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchasesBy = ev.filter(_._4 == "purchase").groupBy(_._1)
    val want = ev.filter(_._4 == "click").map { case (u, id, ts, _) =>
      val next = purchasesBy.getOrElse(u, Array.empty)
        .filter(_._3 >= ts)
        .minByOption(p => (p._3, -p._2)) // min ts; tie → max event_id
      next match {
        case Some(p) => (u, id, p._2, p._3 - ts)
        case None => (u, id, -1L, -1L)
      }
    }.toSet
    assert(got == want)
  }

  test("forward as-of breaks same-time ties by last tieBreak order") {
    import spark.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 200L, 1L))
      .toDF("k", "rt", "v")
    val out = graft.plans.AsOf.join(l, r, Seq("k"), "t", "rt",
      tieBreak = Seq("v"), direction = "forward").collect()
    assert(out.length == 1)
    // smallest rt >= t is 100; among the two rt=100 rows the LAST in
    // ascending tieBreak order (v=9) wins — direction-independent ties
    assert(out.head.getLong(2) == 100L && out.head.getLong(3) == 9L)
  }

  test("forward as-of resolves mixed-case column names per session conf") {
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 10L)).toDF("UserId", "T")
    val r = Seq((1L, 15L, 5L)).toDF("userid", "rT", "v")
    val out = graft.plans.AsOf.join(l, r, Seq("userId"), "t", "rt",
      direction = "forward").collect().sortBy(_.getLong(0))
    assert(out.length == 2)
    assert(out(0).getLong(2) == 15L && out(0).getLong(3) == 5L)
    assert(out(1).isNullAt(2))
  }
}
