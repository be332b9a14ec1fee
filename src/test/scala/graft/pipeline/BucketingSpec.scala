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

  // Fresh temp dir per JVM: bucketed saveAsTable with an explicit
  // `path` makes the tables external, so a leftover
  // spark-warehouse/<table> location from a previous test JVM (the
  // shared never-stopped session's default warehouse) can never trip
  // LOCATION_ALREADY_EXISTS on the managed-table create.
  private lazy val warehouse =
    Files.createTempDirectory("graft-warehouse").toFile.getAbsolutePath

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS ch_b")
    spark.sql("DROP TABLE IF EXISTS ci_b")
    graft.SparkTestSession.cleanup()
  }

  test("bucketed-by-page_id join runs without a shuffle") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val ch = (1 to 1000).map(i => (i % 50, s"sha$i", 1000L + i))
      .toDF("page_id", "raw_sha1", "revision_id")
    val ci = (1 to 200).map(i => (i % 50, s"sha$i", i % 3))
      .toDF("page_id", "raw_sha1", "reference_type")

    ch.write.mode("overwrite").bucketBy(8, "page_id")
      .sortBy("page_id").option("path", s"$warehouse/ch_b")
      .format("parquet").saveAsTable("ch_b")
    ci.write.mode("overwrite").bucketBy(8, "page_id")
      .sortBy("page_id").option("path", s"$warehouse/ci_b")
      .format("parquet").saveAsTable("ci_b")

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
