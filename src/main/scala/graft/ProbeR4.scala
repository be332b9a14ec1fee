package graft

/** Dev probe for the round-4 analytics wave: row counts + samples. */
object ProbeR4 {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(8)
    val names = Seq("q118_sparse_cosine", "q119_pagerank",
      "q120_cohort_retention", "q121_funnel_steps", "q122_json_extract",
      "q123_snapshot_diff", "q124_collocations")
    names.foreach { n =>
      def once(): (Int, Double) = {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sf).collect()
        spark.sharedState.cacheManager.clearCache()
        (rows.length, (System.nanoTime() - t0) / 1e9)
      }
      val (rows1, s1) = once()
      val (_, s2) = once()
      println(f"[probe] $n%-24s rows=$rows1%-6d cold=$s1%.2fs warm=$s2%.2fs")
    }
    spark.stop()
  }
}
