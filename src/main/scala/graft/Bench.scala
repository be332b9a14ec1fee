package graft


/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver's BENCH_r{N}.json.
  *
  * An untimed warmup pass runs first so the timed pass measures
  * steady-state execution (JIT + codegen + parquet footer caches), not
  * JVM startup attributed to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption)
      .getOrElse(32)
    val spark = GraftSession.local(cpus)
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Queries that persist() intermediates (token streams, vocabularies,
    // adjacency lists) leave them registered in the CacheManager; across
    // 100+ queries × 3 passes the resident caches grow to many GB,
    // inflating every later query with eviction + GC churn (round 3's
    // bench ran q37 3× slower than round 2 on identical code). Dropping
    // all caches between queries isolates each measurement; a query's
    // OWN persists still hit within its run, which is the semantics a
    // fresh session per query would give — without paying session
    // startup 336 times.
    def isolate(): Unit = spark.sharedState.cacheManager.clearCache()
    // Warmup (untimed): run each query once.
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
      isolate()
    }
    // Two timed reps, report the min — steady-state latency, robust to
    // GC/scheduler noise in a single pass.
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      isolate()
      sec
    }
    val results = names.map { name =>
      name -> math.min(timeOne(name), timeOne(name))
    }
    // The driver captures only a ~2 KB tail of stdout: full query names ×
    // 79 overflow it (round 1's BENCH json came back parsed:null). So:
    // detail line (full names) FIRST for humans, then the driver-parsed
    // metric line LAST, compact — short qNN keys, 3-decimal values.
    def r3(v: Double): String = f"$v%.3f"
    val detail = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    println(s"""{"detail":$detail}""")
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + r3(v)
    }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
