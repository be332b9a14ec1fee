package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ordering contract between the staged-pipeline queries
  * (q46/q47/q74) and the oracle SQL they hand the driver: `Verify`
  * runs queries FIRST and dumps `oracle_sql.json` AFTER, and
  * `WikitextOps.oracle` is a def that must point DuckDB at the root
  * the MOST RECENT query run actually wrote. A refactor that froze
  * the oracle text early (val), or staged to an sf-unkeyed root,
  * would silently hash-compare one sf's query against another sf's
  * staged files — this spec fails first.
  */
class StageContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("oracle SQL always references the root the last query staged") {
    // Two sf dirs in ONE JVM — the exact sequence that would expose a
    // stale or cross-sf staging root.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val root = WikitextOps.stageRoot(sf)
      graft.SparkEntry.queries("q46_citations_at_revision")(spark, sf)
        .collect() // runs + stages exactly like Verify does
      val stagedOracles = WikitextOps.oracle.filter(
        _._2.contains("graft_stage"))
      // q46 (flagship) and q47 (normalize stats) read staged parquet.
      assert(stagedOracles.keySet == Set(
        "q46_citations_at_revision", "q47_normalize_stats"))
      for ((q, sql) <- stagedOracles) {
        assert(sql.contains(root + "/"),
          s"$q oracle does not reference the staged root for $sf")
        // No stale root from the OTHER sf may leak into this run's SQL.
        val others = Seq("sf0.001", "sf0.01", "sf0.1")
          .filterNot(_ == new java.io.File(sf).getName)
        others.foreach { o =>
          assert(!sql.contains(s"/$o/"),
            s"$q oracle references foreign sf root $o after running $sf")
        }
      }
      // The referenced files actually exist where the SQL points.
      for (t <- Seq("citation_instances", "normalized_citations",
          "citation_histories", "revisions", "extracted_refs")) {
        val dir = new java.io.File(s"$root/$t.parquet")
        assert(dir.isDirectory && dir.listFiles().exists(
            _.getName.endsWith(".parquet")),
          s"staged table $t missing under $root")
      }
    }
  }
}
