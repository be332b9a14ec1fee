package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental-load primitives: append-only id assignment (the ON
  * CONFLICT DO NOTHING analogue) and small-file compaction.
  */
class IncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("appendIds: existing ids stable, new keys get dense tail ids") {
    import spark.implicits._
    val existing = Resolve.withSequentialId(
      Seq("alpha", "bravo", "carol").toDF("label"), Seq("label"), "id")
    // delta: two known keys (one duplicated), two new keys
    val delta = Seq("bravo", "delta", "bravo", "echo").toDF("label")
    val merged = Resolve.appendIds(existing, delta, Seq("label"), "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map(
      "alpha" -> 1L, "bravo" -> 2L, "carol" -> 3L, // untouched
      "delta" -> 4L, "echo" -> 5L))                // dense continuation
    // idempotent: re-applying the same delta changes nothing
    val again = Resolve.appendIds(
      Resolve.appendIds(existing, delta, Seq("label"), "id"),
      delta, Seq("label"), "id")
    assert(again.count() == 5)
  }

  test("appendIds from an empty base starts at 1") {
    import spark.implicits._
    val empty = Resolve.withSequentialId(
      Seq.empty[String].toDF("label"), Seq("label"), "id")
    val merged = Resolve.appendIds(empty,
      Seq("x", "y").toDF("label"), Seq("label"), "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("x" -> 1L, "y" -> 2L))
  }

  test("compact: many small files become few, rows unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").toFile.getAbsolutePath
    val data = (1 to 1000).toDF("n")
    // simulate micro-batch appends: 10 writes of 100 rows
    (0 until 10).foreach { i =>
      data.filter($"n" > i * 100 && $"n" <= (i + 1) * 100)
        .repartition(4)
        .write.mode("append").parquet(s"$dir/t")
    }
    val (before, after, rows) = Compact.compact(spark, s"$dir/t")
    assert(rows == 1000)
    assert(before >= 10)
    assert(after < before)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0) == 500500L)
  }
}
