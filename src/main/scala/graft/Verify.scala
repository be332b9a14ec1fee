package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Optional third arg: comma-separated query-name prefixes — local
    // iteration on a few queries without replaying the whole suite.
    // The driver always passes exactly two args (full run).
    val only = args.drop(2).headOption.map(_.split(',').toSeq)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption)
      .getOrElse(32)
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A throwing query must surface as a RED row, not a missing one:
        // round 4 lost 12 queries from the gate's denominator because the
        // failure only went to stderr. The .ERROR.json artifact gives the
        // driver (and any human reading outDir) a per-query failure record,
        // and no result directory exists so a hash-compare can't pass.
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        Files.writeString(Paths.get(s"$outDir/$name.ERROR.json"),
          s"""{"query": ${q(s"$name.parquet")}, "error": ${q(msg.take(2000))}}""")
      }
      // Drop caches left by queries that persist() intermediates, so
      // resident cached data can't accumulate across the 100+ queries,
      // and force GC so shuffle/broadcast cleanup drains in small steps
      // instead of one storm (see the matching note in Bench).
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    // Emit every oracle under BOTH the bare query name and the
    // result-directory name ("<name>.parquet"): the driver keys its
    // lookup by directory name, local tooling by bare name. Dual keys
    // satisfy either contract (round-1 driver run missed all 79 oracles
    // on exactly this mismatch).
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
