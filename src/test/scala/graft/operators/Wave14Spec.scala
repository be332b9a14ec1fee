package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-14 operators: BPE merge learning (q191), daily
  * gap fill (q192), declarative data-quality checks (q193) and label
  * propagation (q194). Each is pinned against an independent in-memory
  * reference implementation of the textbook algorithm at sf0.001 — the
  * DuckDB oracle separately hash-checks exact values at the gate SFs.
  */
class Wave14Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  // ---- q191: BPE ------------------------------------------------------

  test("q191 learns the same 3 merges as a sequential reference BPE") {
    val got = graft.SparkEntry.queries("q191_bpe_merges")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // reference: greedy left-to-right BPE on the collected corpus
    var docs = graft.Tables.table(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty).toVector)
    val want = (1 to 3).map { round =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      docs.foreach { ts =>
        ts.sliding(2).foreach {
          case Seq(a, b) if a != b =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ => ()
        }
      }
      val ((x, y), cnt) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      docs = docs.map { ts =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == x && ts(i + 1) == y) {
            out += s"$x~$y"; i += 2
          } else { out += ts(i); i += 1 }
        }
        out.result()
      }
      (round.toLong, x, y, cnt)
    }
    assert(got.toSeq == want)
  }

  // ---- q192: gap fill -------------------------------------------------

  test("q192 densifies each user's span and forward-fills gaps") {
    val rows = graft.SparkEntry.queries("q192_gap_fill")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byUser = rows.groupBy(_._1)
    val nsPerDay = 86400000000000L
    val daily = graft.Tables.table(spark, sf, "events")
      .select(col("user_id"), expr(s"ts div $nsPerDay").as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id", "day").agg(sum("cents").as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val spans = daily.keys.groupBy(_._1).view
      .mapValues(ks => (ks.map(_._2).min, ks.map(_._2).max)).toMap
    assert(byUser.keySet == spans.keySet)
    byUser.foreach { case (u, rs) =>
      val (d0, d1) = spans(u)
      assert(rs.map(_._2).sorted.toSeq == (d0 to d1),
        s"user $u must cover every day of its span exactly once")
      var lastSeen = 0L
      (d0 to d1).foreach { day =>
        val (_, _, filled, isGap) = rs.find(_._2 == day).get
        daily.get((u, day)) match {
          case Some(c) =>
            assert(!isGap && filled == c, s"observed day $day of user $u")
            lastSeen = c
          case None =>
            assert(isGap && filled == lastSeen,
              s"gap day $day of user $u must carry $lastSeen forward")
        }
      }
    }
  }

  // ---- q193: data-quality checks --------------------------------------

  test("q193 counts violations per expectation in one scan semantics") {
    val got = graft.SparkEntry.queries("q193_dq_checks")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val li = graft.Tables.table(spark, sf, "lineitem").collect()
    val n = li.length.toLong
    assert(got.values.forall(_._2 == n), "every check audits every row")
    def cnt(bad: org.apache.spark.sql.Row => Boolean): Long =
      li.count(bad).toLong
    assert(got("quantity_in_1_50")._1 ==
      cnt(r => r.getDouble(4) < 1 || r.getDouble(4) > 50))
    assert(got("price_nonnegative")._1 == cnt(r => r.getDouble(5) < 0))
    assert(got("returnflag_in_domain")._1 ==
      cnt(r => !Set("A", "N", "R").contains(r.getString(8))))
    assert(got("linestatus_in_domain")._1 ==
      cnt(r => !Set("O", "F").contains(r.getString(9))))
    assert(got("shipdate_present")._1 == cnt(r => r.isNullAt(10)))
    val orderkeys = graft.Tables.table(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got("orderkey_fk_integrity")._1 ==
      cnt(r => !orderkeys.contains(r.getLong(0))))
  }

  // ---- q194: label propagation ----------------------------------------

  test("q194 equals a reference 2-round synchronous LPA") {
    val got = graft.SparkEntry.queries("q194_label_propagation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val li = graft.Tables.table(spark, sf, "lineitem")
    val or = graft.Tables.table(spark, sf, "orders")
    val eo = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // symmetrized MULTI-set of directed edges, exactly as the query
    // builds them (a node pair may appear once per direction only,
    // because eo is distinct)
    val in = (eo ++ eo.map(_.swap)).groupBy(_._2).view
      .mapValues(_.map(_._1)).toMap
    var labels = in.keySet.map(v => v -> v).toMap
    (1 to 2).foreach { _ =>
      labels = in.map { case (v, srcs) =>
        val votes = srcs.map(labels).groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        v -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val want = labels.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.map { case (l, c) => (l, c) }
      .sortBy { case (l, c) => (-c, l) }.take(20)
    assert(got == want)
  }
}
