package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the round-4 analytics wave (q118–q124),
  * checked against independent in-test recomputation on sf0.001 —
  * these hold regardless of the DuckDB oracle.
  */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def run(n: String) = AnalyticsOps.queries(n)(spark, sf)

  test("q118 equals a from-scratch Scala recomputation") {
    // Independent implementation: shingle sets in plain Scala.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty))
    val sets: Map[Long, Set[String]] = docs.collect {
      case (id, t) if t.length >= 5 =>
        id -> t.sliding(5).map(_.mkString(" ")).toSet
    }.toMap
    val df = sets.values.flatten.groupBy(identity).map {
      case (sg, occ) => sg -> occ.size
    }
    val rare = df.collect { case (sg, n) if n >= 2 && n <= 10 => sg }.toSet
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      shared = (sets(i) & sets(j)).size
      sharedRare = (sets(i) & sets(j) & rare).size
      if sharedRare >= 2
      cos2 = shared.toLong * shared * 1000000L /
        (sets(i).size.toLong * sets(j).size)
      if cos2 >= 250000L
    } yield (i, j) -> (shared.toLong, cos2)).toMap
    val got = run("q118_sparse_cosine").collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 must produce at least one near-dup pair")
  }

  test("q119 rank mass is conserved and output is valid") {
    val rows = run("q119_pagerank").collect()
    assert(rows.length == 20)
    val ids = rows.map(_.getString(0))
    assert(ids.distinct.length == 20)
    assert(ids.forall(id => id.startsWith("c") || id.startsWith("s")))
    val rs = rows.map(_.getLong(1))
    assert(rs.forall(_ >= 150000L), "rank floor is the damping constant")
    assert(rs.sameElements(rs.sortBy(-_)), "descending by rank")
  }

  test("q120 cohort offset-0 equals cohort size; retention never exceeds it") {
    val rows = run("q120_cohort_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val size0 = rows.collect { case (c, 0L, n) => c -> n }.toMap
    rows.foreach { case (c, off, n) =>
      assert(off >= 0, s"negative offset for cohort $c")
      assert(n <= size0(c), s"cohort $c offset $off exceeds cohort size")
    }
    // offset-0 user total == all users (everyone is active in week 0)
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(size0.values.sum == users)
  }

  test("q121 funnel is monotone") {
    val n = run("q121_funnel_steps").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(n("1_view") >= n("2_click"))
    assert(n("2_click") >= n("3_purchase"))
    assert(n("1_view") > 0)
  }

  test("q122 bucket sums are consistent with bucket bounds") {
    val rows = run("q122_json_extract").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, b, n, sum) =>
      assert(et != null && n > 0)
      assert(sum >= n * b * 10 && sum <= n * (b * 10 + 9),
        s"sum_k $sum outside bucket [$b] bounds for n=$n")
    }
  }

  test("q123 diff counts match modular-arithmetic expectation") {
    val got = run("q123_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var added, removed, changed, unchanged = 0L
    docs.foreach { case (id, text) =>
      val inV1 = id % 17 != 0
      val inV2 = id % 19 != 0
      val edited = id % 13 == 0 && text.length > 10
      (inV1, inV2) match {
        case (false, true) => added += 1
        case (true, false) => removed += 1
        case (true, true)  => if (edited) changed += 1 else unchanged += 1
        case _             => ()
      }
    }
    val expected = Map("added" -> added, "removed" -> removed,
      "changed" -> changed, "unchanged" -> unchanged)
      .filter(_._2 > 0)
    assert(got == expected)
  }

  test("q125 binned range join equals the naive BETWEEN join, no NLJ") {
    import org.apache.spark.sql.functions._
    val df = run("q125_range_join")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "binned range join must plan as an equi-join")
    val dayMs = 86400000L
    val win = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("long").as("w_id"))
      .withColumn("start_ms", lit(788918400000L) + col("w_id") * (90L * dayMs))
      .withColumn("end_ms",
        col("start_ms") + (col("w_id") % 7 + 1) * (20L * dayMs))
    val naive = spark.read.parquet(s"$sf/orders.parquet")
      .select(unix_millis(col("o_orderdate").cast("timestamp")).as("o_ms"),
        col("o_totalprice"))
      .join(win, col("o_ms").between(col("start_ms"), col("end_ms")))
      .groupBy("w_id")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice")).cast("long")).as("sum_price"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("q126 pareto frontier equals the naive dominance scan") {
    val pts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        (r.getLong(0), r.getString(1).length.toLong,
          toks.distinct.length.toLong)
      }
    val expected = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.map { case (id, x, y) => id -> (x, y) }.toMap
    val got = run("q126_pareto_frontier").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q127 zorder chunks bound BOTH dimensions (and match a recompute)") {
    def spread(v: Long): Long = {
      var x = v
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_shipdate").collect()
      .map { r =>
        val xb = r.getLong(0) % 4096
        // l_shipdate is TIMESTAMP_NTZ -> LocalDateTime in collect()
        val ms = r.getAs[java.time.LocalDateTime](1)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        val yb = (ms / 86400000L) % 4096
        (xb, yb, (spread(xb) | (spread(yb) << 1)) / 4096)
      }
    val expected = rows.groupBy(_._3).map { case (chunk, g) =>
      chunk -> (g.length.toLong, g.map(_._1).min, g.map(_._1).max,
        g.map(_._2).min, g.map(_._2).max)
    }
    val got = run("q127_zorder").collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }.toMap
    assert(got == expected)
    // the data-skipping property: every chunk spans < 64 in BOTH dims
    got.values.foreach { case (_, xmin, xmax, ymin, ymax) =>
      assert(xmax - xmin < 64 && ymax - ymin < 64)
    }
  }

  test("q128 token entropy equals a from-scratch recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty))
    val expected = docs.collect { case (id, toks) if toks.nonEmpty =>
      val n = toks.length.toDouble
      val h = toks.groupBy(identity).values.map { g =>
        val p = g.length / n
        math.floor(-1e6 * p * math.log(p)).toLong
      }.sum
      id -> (toks.length.toLong, h)
    }.toMap
    val got = run("q128_token_entropy").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    // entropy bounded by ln(vocab size) per doc
    docs.foreach { case (id, toks) =>
      if (toks.nonEmpty) {
        val bound = math.log(toks.distinct.length.toDouble) * 1e6
        assert(got(id)._2 <= bound + 1, s"doc $id exceeds ln(V) bound")
      }
    }
  }

  test("q124 collocations are ordered, above min-count, and PMI-exact") {
    val rows = run("q124_collocations").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.forall(_._3 >= 5L), "min bigram count")
    val pmis = rows.map(_._4)
    assert(pmis.sameElements(pmis.sortBy(-_)), "descending by pmi")
    // Exact PMI recheck for the top pair from raw token counts.
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    val uni = toks.flatten.groupBy(identity).map { case (t, o) => t -> o.size }
    val tu = uni.values.map(_.toLong).sum
    val tb = toks.map(t => math.max(t.length - 1, 0).toLong).sum
    val (a, b, cab, pmi) = rows.head
    val exp = math.floor(math.log(
      cab.toDouble * tu * tu / (tb.toDouble * uni(a) * uni(b))) * 1e6).toLong
    assert(pmi == exp)
  }
}
