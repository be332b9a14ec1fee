package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-3 curation operators: token-window chunking
  * (q94), count-min-sketch heavy hitters (q95), int8 embedding
  * quantization (q96) and broadcast Bloom decontamination (q97).
  * The DuckDB oracle checks exact values; these specs pin the semantic
  * invariants that make the operators correct at any scale.
  */
class CurationOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q94 chunks tile every document: idx contiguous, stride-48 coverage") {
    val chunks = TextOps.queries("q94_chunk_windows")(spark, sf)
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"),
        min("chunk_idx").as("mn"))
      .select("n", "mx", "mn")
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getLong(2) == 0L, "first chunk_idx must be 0")
      assert(r.getLong(0) == r.getLong(1) + 1, "chunk_idx contiguous")
    }
    // each chunk is the window clamped at doc end:
    // chunk_len == min(64, total_tokens - idx*48)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val bad = chunks
      .withColumn("total", max(col("chunk_idx") * 48 + col("chunk_len")).over(w))
      .filter(col("chunk_len") =!=
        least(lit(64L), col("total") - col("chunk_idx") * 48))
      .count()
    assert(bad == 0L)
  }

  test("q95 CMS estimates dominate true counts (overestimate-only)") {
    val rows = TextOps.queries("q95_cms_heavy_hitters")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val t = r.getLong(1); val e = r.getLong(2)
      assert(e >= t, s"${r.getString(0)}: cms=$e < true=$t")
    }
  }

  test("q96 int8 quantization: bounded reconstruction error, sane checksums") {
    val rows = VectorOps.queries("q96_int8_quant")(spark, sf)
    val n = rows.count()
    assert(n > 0)
    // per-component error <= scale/2, so err <= scale/2 * sqrt(dim);
    // scale <= max|v|/127 and |v| <= 1-ish for the synthetic vectors.
    val bad = rows.filter(col("recon_err") >
      col("scale_r") * 0.51 * math.sqrt(64)).count()
    assert(bad == 0L)
    assert(rows.filter(col("q_l1") <= 0).count() == 0L)
  }

  test("q97 Bloom flags are a superset of exact q89 contamination") {
    val exact = TextOps.queries("q89_contamination")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = TextOps.queries("q97_bloom_decontam")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(bloom),
      s"missed: ${(exact -- bloom).take(5).mkString(",")}")
  }
}
