package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Dev probe: warm-repeat timing + GC accounting for round-4 queries,
  * with an established query (q37) as control.
  */
object ExplainR4 {
  def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
    .map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(32)
    Seq("q37_lsh_pairs", "q118_sparse_cosine", "q119_pagerank",
      "q120_cohort_retention", "q124_collocations").foreach { n =>
      (1 to 3).foreach { rep =>
        val g0 = gcMs
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sf).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val g = gcMs - g0
        spark.sharedState.cacheManager.clearCache()
        println(f"[explain] $n%-22s rep=$rep rows=${rows.length}%-5d t=$sec%6.2fs gc=${g}ms")
      }
    }
    spark.stop()
  }
}
