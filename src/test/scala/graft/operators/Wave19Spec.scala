package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-19 operators (q215–q219) against independent
  * sequential references; the DuckDB oracle separately hash-checks
  * exact values at the gate SFs. q217 runs at sf0.01 where edit-
  * distance-1 clusters genuinely form (sf0.001's 10 suppliers are all
  * singletons).
  */
class Wave19Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def q(name: String, dir: String = sf) =
    graft.SparkEntry.queries(name)(spark, dir)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def edges(dir: String): Set[(Long, Long)] = {
    val o = graft.Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (o(r.getLong(0)), r.getLong(1))).toSet
  }

  test("q215 two-hop floor-means match a sequential message pass") {
    val e = edges(sf)
    val cents = graft.Tables.table(spark, sf, "supplier")
      .select("s_suppkey", "s_acctbal").collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100).toLong)
      .toMap
    def floorMean(xs: Iterable[Long]): Long =
      math.floorDiv(xs.sum, xs.size.toLong)
    val h1 = e.groupBy(_._1).map { case (c, es) =>
      c -> floorMean(es.toSeq.map(x => cents(x._2)))
    }
    val want = e.groupBy(_._2).map { case (s0, es) =>
      s0 -> ((es.size.toLong, floorMean(es.toSeq.map(x => h1(x._1)))))
    }
    val got = q("q215_gnn_2hop").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("q216 negatives are exactly the hash candidates minus real edges") {
    val e = edges(sf)
    val nSupp = graft.Tables.table(spark, sf, "supplier").count()
    val custs = graft.Tables.table(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val want = (for {
      c <- custs; i <- 0 until 5
      cand = java.lang.Long.parseLong(
        md5hex(s"$c#$i").take(13), 16) % nSupp + 1
      if !e.contains((c, cand))
    } yield (c, i.toLong, cand)).toSet
    val got = q("q216_negative_edges").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q217 entities match a union-find over brute-force ed<=1 pairs " +
      "and some entity merges multiple records (sf0.01)") {
    val d01 = "/root/testdata/sf0.01"
    val nations = graft.Tables.table(spark, d01, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1).toLowerCase).toMap
    val recs = graft.Tables.table(spark, d01, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase + " " + nations(r.getInt(2)),
        math.floor(r.getDouble(3) * 100).toLong))
    val parent = scala.collection.mutable.Map(
      recs.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for {
      a <- recs; b <- recs if a._1 < b._1
      if lev(a._2, b._2) <= 1
    } {
      val (ra, rb) = (find(a._1), find(b._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = recs.groupBy(r => find(r._1)).map { case (ent, ms) =>
      ent -> ((ms.length.toLong, ms.map(_._2).min, ms.map(_._3).max,
        ms.map(_._3).sum))
    }
    val got = q("q217_entity_resolution", d01).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    assert(got.values.exists(_._1 > 1),
      "at least one entity should merge multiple supplier records")
  }

  test("q218 S-curve matches a sequential perturbation sweep and is " +
      "monotone in the Jaccard decile") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)))
      .filter(x => x._1 % 5 == 0 && x._2.length >= 20)
    def shingles(t: Array[String]): Set[String] =
      t.sliding(3).map(_.mkString(" ")).toSet
    def sig(sh: Set[String], off: Int): String =
      sh.map(x => md5hex(x).substring(off - 1, off + 7)).min
    val counts = scala.collection.mutable.Map[Long, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    for ((id, t) <- docs; k <- 1 to 9) {
      val tv = t.zipWithIndex.map { case (x, i) =>
        val h = java.lang.Long.parseLong(md5hex(s"$id:$i:$k").take(4), 16)
        if (h % 10 < k) "?" + x else x
      }
      val (sa, sv) = (shingles(t), shingles(tv))
      val inter = (sa & sv).size.toLong
      val uni = sa.size + sv.size - inter
      val dec = math.min(9L, inter * 10 / uni)
      val det = (sig(sa, 1) == sig(sv, 1) && sig(sa, 9) == sig(sv, 9)) ||
        (sig(sa, 17) == sig(sv, 17) && sig(sa, 25) == sig(sv, 25))
      val (n, nd) = counts(dec)
      counts(dec) = (n + 1, nd + (if (det) 1L else 0L))
    }
    val want = counts.map { case (dec, (n, nd)) =>
      dec -> ((n, nd, nd * 1000000L / n))
    }.toMap
    val got = q("q218_lsh_scurve").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    // the curve this audit exists to draw: detection rate rises with true
    // similarity (allow equal neighbors — the tails saturate at 0/1e6)
    val rates = got.toSeq.sortBy(_._1).map(_._2._3)
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
      s"S-curve should be monotone, got $rates")
  }

  test("q219 sliding windows equal the batch 4-windows-per-event rollup") {
    val pts = graft.Tables.table(spark, sf, "events")
      .selectExpr("ts div 1000000000 AS sec",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val want = pts.flatMap { case (sec, cents) =>
      (0 to 3).map(k => (((sec / 900) - k) * 900, cents))
    }.groupBy(_._1).map { case (w, rows) =>
      fmt.format(java.time.Instant.ofEpochSecond(w)) ->
        ((rows.length.toLong, rows.map(_._2).sum))
    }
    val got = q("q219_stream_sliding").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }
}
