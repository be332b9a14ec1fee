package graft

/** Whole-suite executed-plan audit: runs every SparkEntry query at the
  * given SF and flags scale smells — BroadcastNestedLoopJoin,
  * CartesianProduct, and SinglePartition exchanges — so intended
  * scalar broadcasts can be told apart from accidental quadratic or
  * single-reducer work. Diagnostic main, not part of the driver gate.
  *
  * Usage: runMain graft.PlanSweep [sfDir] [namePrefixes]
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(',').toSeq)
    val spark = GraftSession.local(8)
    val smells = Seq("BroadcastNestedLoopJoin", "CartesianProduct",
      "Exchange SinglePartition")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.count()
          val plan = df.queryExecution.executedPlan.toString
          val hits = smells.flatMap { s =>
            val c = plan.sliding(s.length).count(_ == s)
            if (c > 0) Some(s"$s x$c") else None
          }
          if (hits.nonEmpty) println(s"[sweep] $name: ${hits.mkString(", ")}")
        } catch { case e: Throwable =>
          println(s"[sweep] $name FAILED: ${e.getMessage}")
        }
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }
    println("[sweep] done")
    spark.stop()
  }
}
