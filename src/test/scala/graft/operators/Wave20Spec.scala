package graft.operators

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-20 operators (q220–q223) against independent
  * sequential references; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs.
  */
class Wave20Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String, dir: String = sf) =
    graft.SparkEntry.queries(name)(spark, dir)

  // ---- MG sketch guarantee (pure, no Spark) ----------------------------

  /** Fold a stream through the aggregator along a random split/merge
    * tree, the way Spark's partial aggregation would. */
  private def mgSummarize(
      mg: graft.functions.MisraGries, xs: Seq[String],
      rnd: Random): Map[String, Long] =
    if (xs.length <= 8 || rnd.nextInt(3) == 0)
      xs.foldLeft(mg.zero)(mg.reduce)
    else {
      val cut = 1 + rnd.nextInt(xs.length - 1)
      mg.merge(mgSummarize(mg, xs.take(cut), rnd),
        mgSummarize(mg, xs.drop(cut), rnd))
    }

  test("MG deficit guarantee holds under random merge trees") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val k = 1 + rnd.nextInt(10)
      val mg = new graft.functions.MisraGries(k)
      // Zipf-ish: item i drawn with weight ~ 1/(i+1).
      val n = 200 + rnd.nextInt(800)
      val xs = Seq.fill(n)(s"t${(n / (1 + rnd.nextInt(n))) % 25}")
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val summary = mgSummarize(mg, xs, rnd)
      assert(summary.size <= k, s"trial $trial: size ${summary.size} > $k")
      for ((t, c) <- exact if c * (k + 1) > n)
        assert(summary.contains(t),
          s"trial $trial: heavy '$t' (cnt $c, n $n, k $k) dropped")
      for ((t, c) <- summary)
        assert(c <= exact(t), s"trial $trial: '$t' overcounted")
    }
  }

  test("q220 equals the exact full-groupBy heavy-hitter answer") {
    val toks = graft.Tables.table(spark, sf, "documents")
      .select("text").collect().iterator
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
      .toSeq
    val n = toks.length.toLong
    val want = toks.groupBy(identity).collect {
      case (t, g) if g.size.toLong * 200 > n => (t, g.size.toLong, n)
    }.toSet
    val got = q("q220_mg_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty) // stopword-dense corpus: must find hitters
  }

  test("q221 transition matrix matches a sequential pass") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(2)
        .collect { case Array(a, b) => (a, b) }
    }
    val cnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val from = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = cnt.map { case ((a, b), c) =>
      (a, b, c, math.floorDiv(c * 1000000L, from(a)))
    }.toSet
    val got = q("q221_event_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    // Rows sum to 1e6 per source state, up to the floor-division dust.
    val bySrc = got.groupBy(_._1)
    for ((_, rows) <- bySrc) {
      val s = rows.toSeq.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.size)
    }
  }

  test("q222 finds the schema's real FK joins with full containment") {
    val got = q("q222_joinable_columns").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(5))).toSet
    // FK value sets are subsets of their PK sets: containment 1e6.
    val fks = Seq(
      ("customer.c_custkey", "orders.o_custkey"),
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey"),
      ("lineitem.l_partkey", "part.p_partkey"),
      ("customer.c_nationkey", "nation.n_nationkey"))
    for ((a, b) <- fks) {
      val hit = got.find(r => (r._1 == a && r._2 == b) ||
        (r._1 == b && r._2 == a))
      assert(hit.exists(_._3 == 1000000L), s"$a ⋈ $b: $hit")
    }
  }

  test("q223 chunking is exact on a sequential reference") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunksOf(text: String): Seq[String] = {
      val len = text.length
      val cuts = 1 +: (2 to len - 3).filter { i =>
        java.lang.Long.parseLong(
          md5hex(text.substring(i - 1, i + 3)).take(4), 16) % 37 == 0
      }
      cuts.zip(cuts.drop(1) :+ (len + 1)).map { case (st, en) =>
        text.substring(st - 1, en - 1)
      }
    }
    val all = docs.flatMap { case (id, t) => chunksOf(t).map(c => (id, c)) }
    val want = all.groupBy(_._2).collect {
      case (c, g) if g.size >= 2 =>
        (md5hex(c), c.length.toLong, g.size.toLong,
          g.map(_._1).distinct.size.toLong)
    }.toSet
    val got = q("q223_cdc_chunks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty) // repetitive synthetic corpus: dups must exist
  }
}
