package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The correctness-dump contract around FAILING queries: a query that
  * throws must leave a per-query .ERROR.json red artifact (and no
  * result directory), never silently vanish from the gate — the
  * round-4 failure mode where 12 broken queries shrank the denominator
  * invisibly. Also pins the JSON escaping that keeps the driver's
  * json.load alive when error messages carry quotes/newlines.
  */
class VerifySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.shuffle.partitions", "2")
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("a throwing query writes an .ERROR.json red artifact") {
    val out = Files.createTempDirectory("verify_err").toString
    Verify.runOne(spark, "/nonexistent", out, "qXX_broken",
      (s, _) => s.range(1).select(
        expr("assert_true(false, 'boom \"quoted\"\\nline2')")))
    val err = Paths.get(s"$out/qXX_broken.ERROR.json")
    assert(Files.exists(err), "red artifact must exist")
    assert(!Files.exists(Paths.get(s"$out/qXX_broken.parquet")),
      "no result directory may exist for a failed query")
    val content = Files.readString(err)
    // must be parseable JSON with the expected keys — same contract the
    // driver's json.load relies on
    assert(content.contains("\"query\": \"qXX_broken.parquet\""))
    assert(content.contains("\"error\""))
    // control characters and quotes must be escaped, not raw
    assert(!content.exists(c => c < ' '), "raw control chars break json.load")
  }

  test("a succeeding query writes its result directory and no artifact") {
    val out = Files.createTempDirectory("verify_ok").toString
    Verify.runOne(spark, "/unused", out, "qXX_ok",
      (s, _) => s.range(3).toDF("v"))
    assert(Files.exists(Paths.get(s"$out/qXX_ok.parquet")))
    assert(!Files.exists(Paths.get(s"$out/qXX_ok.ERROR.json")))
    assert(spark.read.parquet(s"$out/qXX_ok.parquet").count() == 3)
  }

  test("jsonStr escapes quotes, backslashes and control characters") {
    assert(Verify.jsonStr("a\"b\\c\nd\te\rf") ==
      "\"a\\\"b\\\\c\\nd\\te\\r\\u0001f\"")
  }
}
