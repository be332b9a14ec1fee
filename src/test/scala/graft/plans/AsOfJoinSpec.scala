package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join operator (logical node -> injected strategy ->
  * AsOfJoinExec merge): semantics on hand-built edges, equivalence with
  * the compositional q70 window form on real data, and the physical
  * plan contract (two exchanges, streaming merge, no window).
  */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private val sf = "/root/testdata/sf0.001"

  private def edges = {
    import spark.implicits._
    // (key, ts) left probes vs (key, ts, id) right quotes
    val left = Seq((1L, 10L), (1L, 20L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "t")
    val right = Seq(
      (1L, 10L, 100L), (1L, 15L, 101L), (1L, 25L, 102L),
      (2L, 6L, 200L), // after the only left probe for key 2
      (4L, 1L, 400L)) // key never probed
      .toDF("k", "rt", "rid")
    (left, right)
  }

  test("picks the greatest right time <= left time; unmatched " +
    "left rows keep nulls") {
    val (l, r) = edges
    val out = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("rid"))
      .select("k", "t", "rid")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).sorted.toSeq
    assert(out == Seq(
      (1L, 10L, 100L),  // exact-time match counts (>=, not >)
      (1L, 20L, 101L),  // 15 is the latest <= 20
      (1L, 20L, 101L),  // duplicate left times match identically
      (2L, 5L, -1L),    // only right quote is later -> null
      (3L, 7L, -1L)))   // key absent on the right -> null
  }

  test("equal-time right rows resolve by the tie-break ordering") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 3L))
      .toDF("k", "rt", "rid")
    val out = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("rid"))
      .select("rid").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(9L), "the LAST row in tie-break order must win")
  }

  test("nearest: closer side wins, equal gaps tie to backward, one-sided " +
    "matches fall through, no-match rows keep nulls") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 14L), (1L, 26L), (2L, 5L), (3L, 7L))
      .toDF("k", "t")
    val r = Seq(
      (1L, 8L, 100L),   // 10 -> gap 2 backward vs 12's gap 2 forward: tie
      (1L, 12L, 101L),  // 14 -> gap 2 backward... vs 12? 12 is backward of 14
      (1L, 25L, 102L),
      (2L, 9L, 200L),   // only forward of the probe at 5
      (4L, 1L, 400L))
      .toDF("k", "rt", "rid")
    val out = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("rid"),
        direction = "nearest")
      .select("k", "t", "rid", "rt")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).sorted.toSeq
    assert(out == Seq(
      (1L, 10L, 100L),  // |10-8| == |12-10| -> backward wins the tie
      (1L, 14L, 101L),  // 12 (gap 2) beats 25 (gap 11)
      (1L, 26L, 102L),  // 25 (gap 1) is the nearest
      (2L, 5L, 200L),   // forward-only match still matches
      (3L, 7L, -1L)))   // key absent on the right -> null
  }

  test("nearest: right value column colliding with a left column is " +
    "rejected, not silently overwritten") {
    import spark.implicits._
    val l = Seq((1L, 10L, 7L)).toDF("k", "t", "v")
    val r = Seq((1L, 8L, 9L)).toDF("k", "rt", "v") // v collides
    val e = intercept[IllegalArgumentException](
      AsOf.join(l, r, Seq("k"), "t", "rt", direction = "nearest"))
    assert(e.getMessage.contains("collide with left columns"))
    // a right value column named like the LEFT TIME would clobber it too
    val r2 = Seq((1L, 8L, 9L)).toDF("k", "rt", "t")
    intercept[IllegalArgumentException](
      AsOf.join(l.drop("v"), r2, Seq("k"), "t", "rt",
        direction = "nearest"))
  }

  test("nearest: two native passes composed sequentially — no rejoin " +
    "SortMergeJoin in the plan") {
    val (l, r) = edges
    val df = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("rid"),
      direction = "nearest")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("AsOfJoin".r.findAllIn(plan).length >= 2,
      s"expected two native as-of passes\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"),
      s"nearest must not rejoin its two passes\n$plan")
  }

  test("fuzz: random frames with nulls, duplicate keys/times and tie-break " +
    "collisions match an independent per-row reference") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      def maybe[T](v: T): Option[T] = if (rnd.nextInt(12) == 0) None else Some(v)
      // small domains force key collisions, time ties and tie-break dups
      val left = Seq.fill(200)((maybe(rnd.nextInt(8).toLong),
        maybe(rnd.nextInt(40).toLong)))
      val right = Seq.fill(200)((maybe(rnd.nextInt(8).toLong),
        maybe(rnd.nextInt(40).toLong), rnd.nextInt(6).toLong))
      val l = left.toDF("k", "t")
      val r = right.toDF("k", "rt", "rid")
      val got = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("rid"))
        .select("k", "t", "rt", "rid").collect()
        .map(x => (Option(x.get(0)), Option(x.get(1)),
          Option(x.get(2)), Option(x.get(3))))
        .groupBy(identity).view.mapValues(_.length).toMap
      // reference: for each left row, the right rows with the same
      // NON-NULL key and rt <= t; survivor = max (rt, rid); null
      // key/time on either side never matches
      val want = left.map { case (k, t) =>
        val m = (for {
          kk <- k; tt <- t
          best <- right.collect {
            case (Some(rk), Some(rt), rid) if rk == kk && rt <= tt => (rt, rid)
          }.sorted.lastOption
        } yield best)
        (k.map(Long.box), t.map(Long.box),
          m.map(x => Long.box(x._1)), m.map(x => Long.box(x._2)))
      }.groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("matches the compositional q70 window form on real events") {
    val native = graft.SparkEntry.queries("q114_asof_exec")(spark, sf)
      .select("user_id", "purchase_id", "click_id")
    val window = graft.SparkEntry.queries("q70_asof_join")(spark, sf)
      .select("user_id", "purchase_id", "click_id")
    assert(native.count() == window.count())
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("plan: AsOfJoinExec with one exchange + sort per side, no window") {
    val df = graft.SparkEntry.queries("q114_asof_exec")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "the native form must not fall back " +
      "to the carried-union window")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 2, s"expected 2 exchanges (one per side), got $shuffles")
  }

  test("null keys and times never satisfy the as-of predicate") {
    import spark.implicits._
    // SQL semantics of l.k = r.k AND l.t >= r.t: NULL on either side of
    // either comparison is not a match. Without the null guards the
    // nulls-first merge ordering would equi-match NULL keys and treat a
    // NULL right time as "earliest".
    val l = Seq(
      (Some(1L), Some(10L)), // normal probe
      (None, Some(10L)),     // null key -> no match
      (Some(1L), None),      // null time -> no match
      (None, None))
      .toDF("k", "t")
    val r = Seq(
      (Some(1L), Some(5L), 100L),  // the only legitimate match
      (None, Some(1L), 666L),      // null right key: never matches
      (Some(1L), None, 667L))      // null right time: never matches
      .toDF("k", "rt", "rid")
    val out = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("rid"))
      .select("k", "t", "rid")
      .collect().map(x => (
        if (x.isNullAt(0)) -1L else x.getLong(0),
        if (x.isNullAt(1)) -1L else x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).sorted.toSeq
    assert(out == Seq(
      (-1L, -1L, -1L),
      (-1L, 10L, -1L),
      (1L, -1L, -1L),
      (1L, 10L, 100L)))
  }

  test("q129 two-hop pattern equals a naive recompute; hop 2 adds no " +
    "exchange") {
    val df = graft.operators.RelationalOps
      .queries("q129_pattern_match")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert("AsOfJoin ".r.findAllIn(plan).length >= 2,
      s"both hops must plan through the native exec\n$plan")
    // 3 shuffles: purchases, clicks, views — the attributed stream
    // between the hops is re-sorted, never re-partitioned.
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length == 3,
      s"expected exactly three exchanges\n$finalPlan")

    val ev = graft.Tables.table(spark, sf, "events") // ts as ns long
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    def nearest(user: Long, tpe: String, t: Long): Option[Long] = {
      val c = ev.filter(e => e._1 == user && e._3 == tpe && e._4 <= t)
      if (c.isEmpty) None
      else { val mt = c.map(_._4).max
             Some(c.filter(_._4 == mt).map(_._2).max) } // last-in-order
    }
    val expected = ev.filter(_._3 == "purchase").map { p =>
      val click = nearest(p._1, "click", p._4)
      val view = click.flatMap { cid =>
        val cts = ev.find(e => e._2 == cid).get._4
        nearest(p._1, "view", cts)
      }
      (p._1, p._2, click, view)
    }.toSet
    val got = df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
    }.toSet
    assert(got == expected)
    assert(got.exists(_._4.nonEmpty), "at least one full chain expected")
  }

  test("rejects an empty key list up front") {
    val (l, r) = edges
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, Nil, "t", "rt")
    }
    assert(e.getMessage.contains("at least one key"))
  }

  test("resolves column names with the session's case sensitivity") {
    val (l, r) = edges
    // spark.sql.caseSensitive defaults to false — 'K'/'RT' must resolve
    val out = AsOf.join(l, r, Seq("K"), "T", "RT", Seq("RID"))
    assert(out.count() == 5)
  }

  test("survives a repartitioned left side and empty right partitions") {
    import spark.implicits._
    val l = spark.range(0, 1000)
      .select((col("id") % 97).as("k"), col("id").as("t"))
      .repartition(7)
    // right has keys only in [0, 10) -> most partitions empty after
    // the hash exchange
    val r = Seq.tabulate(10)(i => (i.toLong, 500L, i * 10L))
      .toDF("k", "rt", "rid")
    val out = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("rid"))
    val matched = out.filter(col("rid").isNotNull)
    // keys 0..9, left t >= 500 -> ~500/97-ish rows per key match
    assert(matched.count() ==
      l.filter(col("k") < 10 && col("t") >= 500).count())
    assert(out.count() == 1000)
  }
}
