package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-7 retrieval operators: hybrid RRF fusion
  * (q162) and the LSH-bucketed eval-set leakage report (q164). The
  * DuckDB oracle checks exact values; these pin the structural
  * invariants — rank arithmetic, bucket-collision soundness, and the
  * no-corpus-shuffle plan the operator's 100 TB story rests on.
  */
class Wave7Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    graft.functions.GraftFunctions.register(s)
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q162: rrf_micro is exactly the integer RRF of the carried ranks") {
    val rows = VectorOps.queries("q162_rrf_fusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rt = Option(r.getAs[java.lang.Long]("r_text")).map(_.toLong)
      val rv = Option(r.getAs[java.lang.Long]("r_vec")).map(_.toLong)
      assert(rt.nonEmpty || rv.nonEmpty, "a fused doc must come from an arm")
      val expected = rt.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        rv.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_micro") == expected)
    }
    // fused output is sorted by (score desc, doc_id asc) and deduplicated
    val scores = rows.map(r => (-r.getAs[Long]("rrf_micro"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sorted))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }

  test("q162: the semantic arm's ranks agree with the q40 brute-force order") {
    val fused = VectorOps.queries("q162_rrf_fusion")(spark, sf).collect()
    val brute = VectorOps.queries("q40_cosine_topk")(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    // every fused doc with a semantic rank ≤ 20 must sit at exactly that
    // position in the q40 brute-force top-20 (same corpus, same tie-break)
    fused.foreach { r =>
      Option(r.getAs[java.lang.Long]("r_vec")).map(_.toLong)
        .filter(_ <= 20).foreach { rv =>
          assert(brute.get(r.getAs[Long]("doc_id")).contains(rv),
            s"doc ${r.getAs[Long]("doc_id")} semantic rank $rv disagrees with q40")
        }
    }
  }

  test("q164: pairs collide in LSH bucket, ≤3 per bench vector, exact cosine") {
    val out = VectorOps.queries("q164_semantic_decontam")(spark, sf).collect()
    assert(out.nonEmpty)
    val perBench = out.groupBy(_.getAs[Long]("bench_id"))
    assert(perBench.values.forall(_.length <= 3))
    perBench.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.sameElements(1L to rs.length))
    }
    // recompute buckets + cosines in Scala for the returned pairs
    val vecs = graft.Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def bucket(v: Array[Float]): String =
      (1 to 4).map { j =>
        val s = v.indices.foldLeft(0.0) { (a, i) =>
          a + v(i).toDouble * (((j * 31 + (i + 1) * 17) % 7) - 3)
        }
        if (s > 0) '1' else '0'
      }.mkString
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    out.foreach { r =>
      val b = vecs(r.getAs[Long]("bench_id")); val c = vecs(r.getAs[Long]("corpus_id"))
      assert(r.getAs[Long]("bench_id") % 50 == 0)
      assert(r.getAs[Long]("corpus_id") % 50 != 0)
      assert(bucket(b) == bucket(c), "reported pair must share its LSH bucket")
      assert(math.abs(r.getAs[Double]("cos_r") - cos(c, b)) < 1e-5)
    }
  }

  test("q164 plan: bench side broadcast — the corpus is never shuffled") {
    val df = VectorOps.queries("q164_semantic_decontam")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin [bucket"),
      "candidate join must broadcast the benchmark side on bucket")
    assert(!plan.contains("SortMergeJoin"),
      "no sort-merge join: the corpus side must stay unshuffled")
    // the only exchange is the bench_id-keyed rank window over candidates
    val exchanges = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(_.contains("bench_id")),
      s"unexpected exchange beyond the candidate rank window: $exchanges")
  }
}
