package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The full serve-at-scale path — pipeline build, bucketed publish,
  * flagship + template report + batch report served from the bucketed
  * layout, layout plan audits — at sf0.001 so the suite proves the
  * exact code the release gate runs at sf1. `ServeAtScale.run` already
  * `require`s every invariant (served == direct, Exchange-free hot
  * join, single-bucket pruning); the spec's job is to run it and check
  * the metric surface it reports.
  */
class ServeAtScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse =
    Files.createTempDirectory("graft-serve-wh").toFile.getAbsolutePath
  private lazy val servingDir =
    Files.createTempDirectory("graft-serve-out").toFile.getAbsolutePath

  private lazy val spark = GraftSession.builder(Some(4))
    .master("local[4]")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .appName("serve-at-scale-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed serving layout: built, audited, result-identical") {
    val m = ServeAtScale.run(spark, "/root/testdata/sf0.001",
      servingDir, buckets = 8)
    assert(m("exchange_free_hot_join") == true)
    assert(m("bucket_pruned_single_page") == true)
    assert(m("serve_page_rows").asInstanceOf[Int] > 0)
    // every synthetic page contributes its <ref> and its standalone
    // URL to the current-citations batch report (WikitextOps corpus)
    assert(m("batch_report_rows").asInstanceOf[Long] ==
      2L * m("n_pages").asInstanceOf[Long])
  }
}
