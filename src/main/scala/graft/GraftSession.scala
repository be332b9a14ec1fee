package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory for the engine: registers the native
  * functions/optimizer rule and applies the configuration the engine's
  * layouts rely on, so a user switching from the reference gets the
  * intended plans without hunting for conf flags.
  *
  * - `spark.sql.requireAllClusterKeysForCoPartition=false`: the big
  *   serving tables are bucketed by `page_id` alone while the hot joins
  *   key on (page_id, raw_sha1); subset-key bucket reuse needs this off
  *   (semantically safe — equal page_id implies co-location).
  * - `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`:
  *   Spark's heuristic drops bucketed scans for filter-only queries,
  *   which also drops bucket PRUNING — the very win of the single-page
  *   serving lookup.
  * - shuffle partitions default to the core count (overridable): right
  *   for one-node runs; clusters size it to executors × cores, with AQE
  *   coalescing from there.
  */
object GraftSession {

  /** Builder preconfigured for this engine; call `.master(...)` /
    * further `.config(...)` then `.getOrCreate()`. */
  def builder(
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      // Let AQE coalesce small shuffles to the advisory partition size
      // instead of defaulting to full parallelism: a sub-second
      // aggregate's reduce side becomes 1-2 tasks, not 32, which is
      // most of the per-query scheduling floor on a many-query run.
      // On a big cluster the same setting is what the AQE docs
      // recommend once parallelism is already saturated upstream; big
      // shuffles still fan out to the advisory size.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .withExtensions(new graft.functions.GraftExtensions)
  }

  /** Release every cached intermediate left behind by query builders.
    *
    * THE CACHE-LIFETIME CONTRACT: `SparkEntry.queries` builders persist
    * multi-consumer intermediates (signature tables, candidate pairs,
    * adjacency/degree frames, walk tables …) and deliberately do NOT
    * unpersist them — the terminal action happens at the CALLER, after
    * the builder returned, so an in-builder unpersist would drop the
    * cache before it was ever populated. The bound is this call: every
    * harness (Bench between reps, Verify between queries, long-lived
    * embedding sessions between logical requests) drops all caches and
    * nudges GC so cleanup drains in small steps instead of one storm.
    * A session that composes many graft queries without calling this
    * accumulates one query's working set per query — bounded per
    * query, unbounded across them.
    */
  def releaseQueryCaches(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    System.gc()
  }

  /** Local session sized like the driver harness (local[n], UI off). */
  def local(cores: Int = 32): SparkSession = {
    val s = builder(Some(cores))
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
