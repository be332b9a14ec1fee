package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the round-4 audit wave (q130–q135), checked
  * against independent in-test recomputation on sf0.001 — these hold
  * regardless of the DuckDB oracle.
  */
class AuditOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def run(n: String) = AuditOps.queries(n)(spark, sf)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q130 draws exactly the md5-least doc_ids of each source") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map(_._2).sortBy(id => (md5hex(id.toString), id)).take(10)
        .zipWithIndex.map { case (id, i) => (src, id, i + 1L) }
    }.toSet
    val got = run("q130_sample_per_source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q131 matches Scala shingle-set Jaccard for every source pair") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sets: Map[String, Set[String]] = docs.groupBy(_._1).map {
      case (src, rows) =>
        src -> rows.flatMap { case (_, text) =>
          val t = text.toLowerCase.split(" ").filter(_.nonEmpty)
          if (t.length >= 3) t.sliding(3).map(_.mkString(" ")) else Iterator()
        }.toSet
    }
    val srcs = sets.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      inter = (sets(a) & sets(b)).size
      if inter > 0
    } yield (a, b) -> (inter.toLong,
      inter.toLong * 1000000L / (sets(a).size + sets(b).size - inter))).toMap
    val got = run("q131_source_overlap").collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    assert(got.values.forall { case (_, j) => j >= 0 && j <= 1000000L })
  }

  test("q132 decayed score is bounded by the undecayed micro sum") {
    val events = graft.Tables.table(spark, sf, "events")
    import org.apache.spark.sql.functions._
    val plain = events
      .groupBy("user_id")
      .agg(sum(expr("cast(floor(value * 1000000.0) as bigint)")).as("full"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = run("q132_time_decay").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == plain.keySet)
    got.foreach { case (u, (decayed, n)) =>
      val (full, nExp) = plain(u)
      assert(n == nExp)
      assert(decayed >= 0 && decayed <= full,
        s"user $u: decayed $decayed outside [0, $full]")
    }
    // Decay must actually bite: the corpus spans ~30 days with a 3-day
    // half-life, so the total decayed mass is well under the full mass.
    val totDecayed = got.values.map(_._1).sum.toDouble
    val totFull = plain.values.map(_._1).sum.toDouble
    assert(totDecayed < 0.9 * totFull)
  }

  test("q133 transition counts cover exactly n_events - n_users") {
    val events = graft.Tables.table(spark, sf, "events")
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    val rows = run("q133_markov_transitions").collect()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
    // ppm of each from_type row set sums to ~1e6 (floor rounding loses
    // at most one ppm per destination type).
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val s = rs.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - rs.length,
        s"from=$from ppm sum $s")
    }
  }

  test("q134 deciles partition each language monotonically") {
    val rows = run("q134_quality_deciles").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      sorted.foreach { case (_, _, n, lo, hi) =>
        assert(n > 0 && lo <= hi)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, hi1), (_, _, _, lo2, _)) =>
          assert(hi1 <= lo2, s"$lang deciles not monotone")
        case _ =>
      }
      // docs covered = all docs of that language with >= 1 token
      val expected = spark.read.parquet(s"$sf/documents.parquet")
        .where(s"lang = '$lang'")
        .where("size(filter(split(lower(text), ' '), w -> w != '')) > 0")
        .count()
      assert(sorted.map(_._3).sum == expected)
    }
  }

  test("q140 sketch estimate is slot-exact; exact Jaccard matches sets") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sets: Map[Long, Set[String]] = docs.flatMap { case (id, text) =>
      val t = text.toLowerCase.split(" ").filter(_.nonEmpty)
      if (t.length >= 3) Some(id -> t.sliding(3).map(_.mkString(" ")).toSet)
      else None
    }.toMap
    val sigs: Map[Long, Seq[String]] = sets.map { case (id, sh) =>
      val hs = sh.toSeq.map(md5hex)
      id -> Seq(hs.map(_.substring(0, 8)).min, hs.map(_.substring(8, 16)).min,
        hs.map(_.substring(16, 24)).min, hs.map(_.substring(24, 32)).min)
    }
    val rows = TextOps.queries("q140_minhash_accuracy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } * 250000L
      assert(r.getLong(2) == est, s"est mismatch for ($a,$b)")
      val inter = (sets(a) & sets(b)).size.toLong
      val jac = inter * 1000000L / (sets(a).size + sets(b).size - inter)
      assert(r.getLong(3) == jac, s"jaccard mismatch for ($a,$b)")
      assert(r.getLong(4) == math.abs(est - jac))
    }
  }

  test("q141 rolling features match a Scala scan per user") {
    val events = graft.Tables.table(spark, sf, "events")
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100).toLong))
    val expected = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._1))
      ordered.zipWithIndex.map { case ((eid, uid, _, cents), i) =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1)
        eid -> ((uid, cents,
          if (i == 0) None else Some(ordered(i - 1)._4),
          frame.length.toLong, frame.map(_._4).sum))
      }
    }.toMap
    val got = run("q141_lag_features").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got == expected)
  }

  test("q142 journeys cover every user with ≤5 hops each") {
    val events = graft.Tables.table(spark, sf, "events")
    val nUsers = events.select("user_id").distinct().count()
    val rows = run("q142_user_journeys").collect()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    assert(rows.forall(_.getString(0).split(">").length <= 5))
    // independent recompute of one user's path
    val u0 = events.select("user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .filter(_._1 == 0L).sortBy(e => (e._2, e._3)).take(5)
      .map(_._4).mkString(">")
    assert(rows.exists(_.getString(0) == u0))
  }

  test("q143 trailing-window actives dominate dailies") {
    val rows = run("q143_rolling_dau").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (day, dau, wau) =>
      assert(wau >= dau, s"day $day: wau $wau < dau $dau")
    }
    // day 1 of the corpus has an empty trailing history: wau == dau
    assert(rows.head._2 == rows.head._3)
    // wau is bounded by the union of the 7 trailing daus
    val dauByDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, _, wau) =>
      val bound = (day - 6 to day).flatMap(dauByDay.get).sum
      assert(wau <= bound)
    }
  }

  test("q144 deviations sum to zero and flags match the integer rule") {
    val rows = run("q144_anomaly_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._3).sum == 0L) // Σ(N·x − S) = 0 by construction
    val nd = rows.length.toLong
    val s = rows.map(_._2).sum
    val q = rows.map(x => x._2 * x._2).sum
    rows.foreach { case (day, x, dev, flag) =>
      assert(dev == nd * x - s, s"day $day dev")
      assert(flag == (dev * dev > 4 * (nd * q - s * s)), s"day $day flag")
    }
  }

  test("q145 covers exactly the users whose first purchase follows a view") {
    val events = graft.Tables.table(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val v = evs.filter(_._2 == "view").map(_._3).minOption
      val p = evs.filter(_._2 == "purchase").map(_._3).minOption
      (v, p) match {
        case (Some(a), Some(b)) if b >= a => Some((b - a) / 1000000000L)
        case _ => None
      }
    }
    val got = run("q145_conversion_latency").collect()
    assert(got.map(_.getLong(1)).sum == expected.size)
    val byBucket = expected.groupBy(_ / 3600L)
    got.foreach { r =>
      val b = byBucket(r.getLong(0))
      assert(r.getLong(1) == b.size && r.getLong(2) == b.min &&
        r.getLong(3) == b.max)
    }
  }

  test("q135 profiles every column in one row each with sane stats") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val n = orders.count()
    val rows = run("q135_profile_stats").collect()
    assert(rows.length == 6)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == 0) // synthetic data has no nulls
      assert(r.getLong(3) > 0 && r.getLong(3) <= n)
    }
    assert(byCol("o_orderkey").getLong(3) == n) // primary key
    assert(byCol("o_totalprice").isNullAt(4)) // doubles: no min_s/max_s
    assert(byCol("o_orderdate").isNullAt(4))
    assert(byCol("o_orderstatus").getString(4) != null)
    val minKey = orders.agg(org.apache.spark.sql.functions
      .min("o_orderkey")).head().getLong(0)
    assert(byCol("o_orderkey").getString(4) == minKey.toString)
  }
}
