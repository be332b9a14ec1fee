package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Learned-IVF quality contract: the k-means index (q85/q86) must be a
  * usable ANN structure, not just a deterministic computation — probe 2
  * of the learned cells and recover most of the brute-force top-10.
  */
class VectorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q86 nprobe=4 recall@10 vs q40 brute force") {
    // The synthetic vectors are near-uniform (no cluster structure:
    // the true top-10 spreads over 7 of 10 cells), so IVF recall here
    // tracks the probed fraction — 4/10 cells yields 0.7. The
    // assertion pins "well above the probe fraction alone would give
    // by chance" rather than a clustered-corpus recall.
    val brute = VectorOps.queries("q40_cosine_topk")(spark, sf)
      .limit(10).collect().map(_.getAs[Long]("vec_id")).toSet
    val ann = VectorOps.queries("q86_ivf_kmeans_search")(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.5,
      s"nprobe=4 learned-IVF recall@10 too low: $recall " +
        s"(brute=$brute ann=$ann)")
  }

  test("q85 k-means output: every cell non-empty, centroids rounded") {
    val rows = VectorOps.queries("q85_ivf_kmeans")(spark, sf).collect()
    val byCell = rows.groupBy(_.getAs[Int]("cid"))
    assert(byCell.nonEmpty)
    byCell.foreach { case (cid, rs) =>
      val ns = rs.map(_.getAs[Long]("n")).toSet
      assert(ns.size == 1, s"cell $cid: inconsistent sizes $ns")
      assert(ns.head > 0)
      assert(rs.length == 64, s"cell $cid: expected 64 dims")
    }
  }

  test("PQ/ADC search recovers neighbors on clustered data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 5 tight clusters of 20 vectors in 8 dims: center c has coords
    // (c+1)*2 everywhere; members perturb one dim by (i%4)*0.25.
    // Query (vec_id 0) sits in cluster 0 — its true nearest neighbors
    // are exactly its cluster, and PQ codebooks (seeded per label)
    // capture the centers, so the ADC top-10 must stay in-cluster.
    val rows = for {
      c <- 0 until 5; i <- 0 until 20
    } yield {
      val base = Array.fill(8)((c + 1) * 2.0)
      base(i % 8) += (i % 4) * 0.25
      (c.toLong * 20 + i, c, base)
    }
    val e = rows.toDF("vec_id", "label", "v")
    val top = VectorOps.pqSearchOf(e).collect()
      .map(_.getAs[Long]("vec_id"))
    assert(top.length == 10)
    assert(top.forall(id => id >= 1 && id < 20),
      s"ADC neighbors left the query's cluster: ${top.toSeq}")
  }

  test("q84 LSH near-dup pairs are a subset of exact all-pairs") {
    // Every LSH-candidate pair that passes the cosine threshold must
    // also appear in the exhaustive pair scan with the same score —
    // LSH changes the candidate set, never the metric.
    val lsh = VectorOps.queries("q84_lsh_neardup")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("cosine")).toMap
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val e = graft.Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(expr("array_dot(embedding, embedding)")).as("nrm"))
    val a = e.select(col("vec_id").as("a_id"),
      col("embedding").as("a_vec"), col("nrm").as("a_nrm"))
    val b = e.select(col("vec_id").as("b_id"),
      col("embedding").as("b_vec"), col("nrm").as("b_nrm"))
    val exact = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(expr("array_dot(a_vec, b_vec)")
          / (col("a_nrm") * col("b_nrm")), 6).as("cosine"))
      .filter(col("cosine") > 0.3)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("cosine")).toMap
    assert(lsh.nonEmpty, "q84 found no pairs at sf0.001")
    lsh.foreach { case (pair, c) =>
      assert(exact.get(pair).contains(c),
        s"pair $pair cosine $c not confirmed by exact scan")
    }
  }

  test("q137 mutual-kNN pairs are exactly the reciprocal top-3 edges") {
    // Independent recomputation in plain Scala: per-label all-pairs
    // cosine (sequential double accumulation — the ArrayDot contract),
    // round half-up to 6, rank by (cos desc, id), keep reciprocal pairs.
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    def cosR(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val knn: Map[Long, Seq[Long]] = rows.map { case (id, lab, v) =>
      id -> rows.filter(o => o._2 == lab && o._1 != id)
        .map(o => (cosR(v, o._3), o._1))
        .sortBy { case (c, oid) => (-c, oid) }
        .take(3).map(_._2).toSeq
    }.toMap
    val expected = (for {
      (a, nbrs) <- knn.toSeq; b <- nbrs
      if a < b && knn(b).contains(a)
    } yield (a, b)).toSet
    val got = VectorOps.queries("q137_mutual_knn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
