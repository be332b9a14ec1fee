package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale layout proof: bucketing the citation tables by `page_id`
  * makes the hot serving joins (J2/J3/J9) shuffle-free — both sides
  * read pre-hashed buckets, no Exchange in the plan. This is the
  * 28.8B-row `citation_history` strategy from SURVEY.md §4/§7.4-4,
  * demonstrated at fixture scale with a plan assertion.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse =
    Files.createTempDirectory("graft-warehouse").toFile.getAbsolutePath

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .appName("bucketing-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed-by-page_id join runs without a shuffle") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val ch = (1 to 1000).map(i => (i % 50, s"sha$i", 1000L + i))
      .toDF("page_id", "raw_sha1", "revision_id")
    val ci = (1 to 200).map(i => (i % 50, s"sha$i", i % 3))
      .toDF("page_id", "raw_sha1", "reference_type")

    ch.write.mode("overwrite").bucketBy(8, "page_id")
      .sortBy("page_id").format("parquet").saveAsTable("ch_b")
    ci.write.mode("overwrite").bucketBy(8, "page_id")
      .sortBy("page_id").format("parquet").saveAsTable("ci_b")

    val joined = spark.table("ch_b")
      .join(spark.table("ci_b"), Seq("page_id"))
      .groupBy("page_id").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(page_id"),
      s"join should reuse bucket partitioning, got:\n$plan")
    assert(joined.count() == 50)

    // Control: the same join over unbucketed data DOES shuffle.
    val plain = ch.join(ci, Seq("page_id"))
      .groupBy("page_id").agg(count(lit(1)).as("n"))
    assert(plain.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning(page_id"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
