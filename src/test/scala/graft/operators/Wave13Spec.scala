package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AhoCorasick

/** Contracts for the wave-13 operators: interval coalescing (q185),
  * Aho–Corasick multi-pattern matching (q186), frontier BFS (q187),
  * the order-insensitive table checksum (q188), incremental view
  * maintenance (q189) and CDC apply (q190). The DuckDB oracle checks
  * exact values; these pin the algorithmic invariants — automaton
  * semantics against brute force, BFS against a reference traversal,
  * IVM against direct recompute, checksum diff localization, CDC
  * latest-wins/delete semantics — each operator's scale story rests on.
  */
class Wave13Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  // ---- AhoCorasick automaton ------------------------------------------

  test("AhoCorasick matches the classic he/she/his/hers example with " +
    "correct failure transitions") {
    val pats = Seq("he", "she", "his", "hers")
    val ac = AhoCorasick.build(pats)
    // "ushers" contains she (1), he (0), hers (3) — NOT his
    assert(ac.matchedPatterns("ushers").toSet == Set(0, 1, 3))
    // the 's'->'h'->'e' path must fire "he" via the fail link from "she"
    assert(ac.countOccurrences("ushers") == 3)
    assert(ac.matchedPatterns("aaa").isEmpty)
    assert(ac.matchedPatterns("hishers").toSet == Set(0, 1, 2, 3))
  }

  test("AhoCorasick counts overlapping occurrences (automaton-native " +
    "semantics) and equals a brute-force scan on random inputs") {
    val ac = AhoCorasick.build(Seq("aba"))
    assert(ac.countOccurrences("ababa") == 2) // overlapping
    val pats = Seq("ab", "bc", "abc", "cab", "a")
    val auto = AhoCorasick.build(pats)
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { _ =>
      val text = (1 to 40).map(_ => "abc" (rnd.nextInt(3))).mkString
      val expectMatched = pats.zipWithIndex
        .filter { case (p, _) => text.contains(p) }.map(_._2).toSet
      assert(auto.matchedPatterns(text).toSet == expectMatched, s"text=$text")
      val expectCount = pats.map { p =>
        text.sliding(p.length).count(_ == p)
      }.sum.toLong
      assert(auto.countOccurrences(text) == expectCount, s"text=$text")
    }
  }

  test("q186 equals the per-term contains() plan (same result, one scan)") {
    val got = graft.SparkEntry.queries("q186_multi_pattern")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference: derive the same top-20 terms, then count containing
    // docs with 20 separate contains passes (the plan the automaton
    // replaces)
    val docs = graft.Tables.table(spark, sf, "documents")
    val terms = docs
      .select(explode(filter(split(lower(col("text")), " "),
        w => length(w) >= 4)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(20)
      .select("token").collect().map(_.getString(0))
    val want = terms.map { t =>
      t -> docs.filter(lower(col("text")).contains(t)).count()
    }.toMap
    assert(got == want)
  }

  // ---- q185: interval coalescing --------------------------------------

  test("q185 equals a per-user brute-force interval merge") {
    val ivLen = 1800000000000L
    val got = graft.SparkEntry.queries("q185_interval_merge")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val byUser = graft.Tables.table(spark, sf, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val want = byUser.map { case (u, ts) =>
      // classic sweep: extend the current island while start <= maxEnd
      var islands = List.empty[(Long, Long)]
      ts.foreach { t =>
        islands match {
          case (s0, e0) :: rest if t <= e0 =>
            islands = (s0, math.max(e0, t + ivLen)) :: rest
          case _ => islands = (t, t + ivLen) :: islands
        }
      }
      val lens = islands.map { case (s0, e0) => e0 - s0 }
      u -> ((islands.length.toLong, lens.sum, lens.max))
    }
    assert(got == want)
  }

  test("q185 plan has no self-join and only per-user windows") {
    val df = graft.SparkEntry.queries("q185_interval_merge")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "interval merge must not self-join")
    assert(!plan.contains("SinglePartition"),
      "windows must partition by user, never globally")
  }

  test("interval merge matches brute force on seeded random frames " +
    "(touching boundaries, duplicate timestamps)") {
    import spark.implicits._
    val ivLen = 100L
    val rnd = new scala.util.Random(71)
    (1 to 4).foreach { trial =>
      // small time domain forces exact-touch (t == prevEnd) boundaries
      // and duplicate timestamps per user — the tie/adjacency edge cases
      val rows = (1 to 300).map { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(40) * 50L, i.toLong)
      }
      val ev = rows.toDF("user_id", "ts", "event_id")
      val byTime = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val prevEnd = max("iv_end")
        .over(byTime.rowsBetween(org.apache.spark.sql.expressions
          .Window.unboundedPreceding, -1))
      val got = ev.withColumn("iv_end", col("ts") + lit(ivLen))
        .withColumn("ni",
          when(prevEnd.isNull || col("ts") > prevEnd, 1L).otherwise(0L))
        .withColumn("island", sum("ni").over(byTime.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "island")
        .agg(min("ts").as("s"), max(col("iv_end")).as("e"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("e") - col("s")).as("cov"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val want = rows.groupBy(_._1).map { case (u, rs) =>
        var islands = List.empty[(Long, Long)]
        rs.map(_._2).sorted.foreach { t =>
          islands match {
            case (s0, e0) :: rest if t <= e0 =>
              islands = (s0, math.max(e0, t + ivLen)) :: rest
            case _ => islands = (t, t + ivLen) :: islands
          }
        }
        u -> ((islands.length.toLong,
          islands.map { case (s0, e0) => e0 - s0 }.sum))
      }
      assert(got == want, s"trial $trial")
    }
  }

  test("CDC apply matches reference on seeded random changelogs " +
    "(same-key op flips, seq ties broken by event id)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    (1 to 4).foreach { trial =>
      val snap = (0L to 20L).map(k => (k, k * 10)).toDF("key", "bal_cents")
      // duplicate (key, ts) rows force the event_id tie-break
      val chRows = (1 to 200).map { i =>
        (rnd.nextInt(30).toLong, rnd.nextInt(10).toLong, i.toLong,
          if (rnd.nextBoolean()) "D" else "U", rnd.nextInt(1000).toLong)
      }
      val ch = chRows.toDF("key", "ts", "event_id", "op", "new_bal")
      val byKey = org.apache.spark.sql.expressions.Window
        .partitionBy("key").orderBy(col("ts").desc, col("event_id").desc)
      val latest = ch.withColumn("rn", row_number().over(byKey))
        .filter(col("rn") === 1).select("key", "op", "new_bal")
      val got = snap.join(latest, Seq("key"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("key"),
          when(col("op").isNotNull, col("new_bal"))
            .otherwise(col("bal_cents")).as("bal"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val heads = chRows.groupBy(_._1).view
        .mapValues(_.maxBy(e => (e._2, e._3))).toMap
      val want = ((0L to 20L).map(k => k -> k * 10).toMap ++
        heads.view.mapValues(h => h._5).toMap)
        .filter { case (k, _) => !heads.get(k).exists(_._4 == "D") }
      assert(got == want, s"trial $trial")
    }
  }

  // ---- q187: frontier BFS ---------------------------------------------

  test("q187 equals a reference BFS traversal of the collected graph") {
    val got = graft.SparkEntry.queries("q187_bfs_hops")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.Tables.table(spark, sf, "lineitem")
    val or = graft.Tables.table(spark, sf, "orders")
    val eo = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (eo ++ eo.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.keySet.filter(id => id % 2 == 0 && id < 10)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    (1 to 3).foreach { k =>
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> k.toLong)
      frontier = next
    }
    val want = dist.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  // ---- q188: order-insensitive checksum -------------------------------

  test("q188 checksum is invariant under row order and localizes a " +
    "single-row perturbation to at most two buckets") {
    val q = graft.SparkEntry.queries("q188_table_checksum")
    val base = q(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // invariance: recompute over a shuffled, differently-partitioned copy
    val li = graft.Tables.table(spark, sf, "lineitem")
    val shuffled = li.repartition(7, col("l_partkey"))
    shuffled.createOrReplaceTempView("wave13_shuffled_lineitem")
    val canon = concat_ws("|",
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_linenumber"), col("l_returnflag"), col("l_linestatus"),
      coalesce(timestamp_diff("MICROSECOND",
        lit("1970-01-01 00:00:00")
          .cast(org.apache.spark.sql.types.TimestampNTZType),
        col("l_shipdate")
          .cast(org.apache.spark.sql.types.TimestampNTZType)), lit(-1L)))
    def sums(df: org.apache.spark.sql.DataFrame) = {
      val hv = conv(substring(md5(canon), 1, 13), 16, 10).cast("long")
      df.select((hv % 64).as("bucket"), (hv % 1000000007L).as("res"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"), (sum("res") % 1000000007L).as("checksum"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    assert(sums(shuffled) == base, "checksum must not depend on layout")
    // localization: flip one row's return flag — only the buckets of the
    // old and new row hash may change
    val victim = li.select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").head()
    val perturbed = li.withColumn("l_returnflag",
      when(col("l_orderkey") === victim.getLong(0)
          && col("l_linenumber") === victim.getInt(1), lit("Z"))
        .otherwise(col("l_returnflag")))
    val after = sums(perturbed)
    val changed = (base.keySet ++ after.keySet)
      .filter(b => base.get(b) != after.get(b))
    assert(changed.nonEmpty, "perturbation must be visible")
    assert(changed.size <= 2,
      s"a one-row diff must touch <=2 buckets, got $changed")
  }

  test("q188 production hash variant (xxhash64) keeps invariance and " +
    "localization without md5's per-row string cost") {
    // The query pins md5 ONLY because the DuckDB oracle must compute
    // identical hashes; a deployment swaps in codegen'd xxhash64 over
    // the same canonical columns. The checksum properties are hash-
    // agnostic — pin them for the fast variant too.
    val li = graft.Tables.table(spark, sf, "lineitem")
    def sums(df: org.apache.spark.sql.DataFrame) = {
      val hv = abs(xxhash64(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate")))
      df.select((hv % 64).as("bucket"), (hv % 1000000007L).as("res"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), (sum("res") % 1000000007L).as("s"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    val base = sums(li)
    assert(sums(li.repartition(5, col("l_suppkey"))) == base)
    val victim = li.select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").head()
    val after = sums(li.withColumn("l_returnflag",
      when(col("l_orderkey") === victim.getLong(0)
          && col("l_linenumber") === victim.getInt(1), lit("Z"))
        .otherwise(col("l_returnflag"))))
    val changed = (base.keySet ++ after.keySet)
      .filter(b => base.get(b) != after.get(b))
    assert(changed.nonEmpty && changed.size <= 2)
  }

  // ---- q189: incremental view maintenance -----------------------------

  test("q189 delta-rule maintenance equals the direct full recompute") {
    val got = graft.SparkEntry.queries("q189_ivm_join")(spark, sf)
      .collect()
      .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    val direct = graft.Tables.table(spark, sf, "orders")
      .join(graft.Tables.table(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
      .collect()
      .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == direct)
  }

  // ---- q190: CDC apply ------------------------------------------------

  test("q190 applies latest-wins upserts and deletes over the snapshot") {
    val rows = graft.SparkEntry.queries("q190_cdc_apply")(spark, sf).collect()
    val got = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got.size == rows.length, "one output row per key")
    // reference: latest change per key from the raw events
    val ch = graft.Tables.table(spark, sf, "events")
      .filter(col("event_type") =!= "error")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val latest = ch.groupBy(_._1).view.mapValues(
      _.maxBy(e => (e._2, e._3))).toMap
    val snap = graft.Tables.table(spark, sf, "customer")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100).toLong).toMap
    latest.foreach { case (k, e) =>
      if (e._4 == "purchase")
        assert(!got.contains(k), s"deleted key $k must be absent")
      else
        assert(got(k) == ((math.floor(e._5 * 100).toLong, "chg")),
          s"key $k must carry the latest upsert value")
    }
    snap.foreach { case (k, bal) =>
      if (!latest.contains(k))
        assert(got(k) == ((bal, "snap")),
          s"untouched snapshot key $k must pass through")
    }
    // inserts: changed keys outside the snapshot appear iff not deleted
    latest.keySet.filterNot(snap.contains).foreach { k =>
      assert(got.contains(k) == (latest(k)._4 != "purchase"))
    }
  }
}
