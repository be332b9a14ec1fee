package graft

/** Executable walkthrough of the training-data curation surface over
  * the synthetic `documents`/`embeddings` tables: quality profiling,
  * exact + near dedup, duplicate families, decontamination, splits,
  * and ANN search. `runMain graft.CurationDemo [sfDir]`.
  */
object CurationDemo {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    def q(name: String) = SparkEntry.queries(name)(spark, sf)

    println(s"\n=== corpus quality profile (q73) — $sf ===")
    q("q73_quality_profile").show(truncate = false)

    println("=== exact dedup: text vs bag-of-words identity (q30) ===")
    q("q30_dedup_exact").show(truncate = false)

    println("=== near-dup candidate pairs from MinHash-LSH (q37) ===")
    q("q37_lsh_pairs").show(5, truncate = false)

    println("=== duplicate families (q87): components with >1 doc ===")
    val fams = q("q87_neardup_clusters")
    fams.groupBy("component").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1)
      .orderBy("component").show(5)

    println("=== benchmark decontamination hits (q89) ===")
    q("q89_contamination").show(5)

    println("=== hash-stable train/val/test split (q71) ===")
    q("q71_dataset_split").show()

    println("=== ANN: brute-force top-5 vs learned-IVF probe (q40/q86) ===")
    q("q40_cosine_topk").show(5)
    q("q86_ivf_kmeans_search").show(5)

    spark.stop()
  }
}
