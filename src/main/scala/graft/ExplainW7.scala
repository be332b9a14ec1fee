package graft
object ExplainW7 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    for (n <- Seq("q162_rrf_fusion", "q164_semantic_decontam")) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.collect()
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Window") || l.contains("TakeOrdered") || l.contains("Scan"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
