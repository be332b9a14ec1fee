package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checked plan quality: the properties `graft.Explain` is used
  * to eyeball are asserted here so a regression (lost pushdown, lost
  * broadcast, lost codegen) fails the build, not just the benchmark.
  */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .appName("plan-audit")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def executedPlanString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters reach the parquet scan; projection pruned") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(l_quantity"))
    // 5 of 16 lineitem columns read: 3 projected + 2 filter-only.
    assert(scan.schema.fieldNames.length == 5)
  }

  test("q12: dimension chain joins broadcast") {
    val plan = executedPlanString("q12_join_chain")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q01: whole-stage codegen covers the aggregation") {
    val plan = executedPlanString("q01_agg_pricing")
    // codegen'd operators render with the "*(n)" stage prefix
    assert(plan.contains("*(") && plan.contains("HashAggregate"))
  }

  test("q62: exactly one shuffle per join key family under AQE") {
    val plan = executedPlanString("q62_star_join")
    // nation/region must come in as broadcasts, never shuffled.
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q40: embedding scan stays map-only until TakeOrdered") {
    val plan = executedPlanString("q40_cosine_topk")
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("array_dot"))
  }
}
