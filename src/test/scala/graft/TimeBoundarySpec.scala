package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events-time read boundary against generator schema drift —
  * the class of breakage that cost round 4 twelve batch queries and four
  * streaming queries when the testdata's `ts` silently changed from raw
  * INT64 nanoseconds to parquet TIMESTAMP(MICROS).
  *
  * The spec writes its OWN parquet in both shapes (Spark writes
  * TimestampNTZType as TIMESTAMP(MICROS, isAdjustedToUTC=false) — byte-
  * identical to the current generator) and asserts that `Tables.table`
  * and `StreamingOps.streamEvents` canonicalize both to the same
  * nanosecond longs, under a NON-UTC session timezone so any tz-dependent
  * conversion sneaking into the boundary fails loudly.
  */
class TimeBoundarySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  // micros since epoch, spanning a DST transition (2020-03-08 US) so a
  // session-tz cast would shift some rows by 3600s and not others
  private val micros = Seq(
    0L, 1583650800000000L, 1583657999999999L, 1583661600000000L,
    1600000000123456L)

  private def writeDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeNtz(dir: String): Unit = {
    import spark.implicits._
    val df = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      // tz-free NTZ construction (timestamp_micros().cast(ntz) would
      // render the instant in the session tz and shift the naive value)
      .withColumn("ts", expr(
        "timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    writeSingleFile(df, dir)
  }

  /** The generator emits ONE FILE named events.parquet (not a Spark
    * output directory) — the streaming source's pathGlobFilter depends
    * on that, so the fixture must match. */
  private def writeSingleFile(
      df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val tmp = s"$dir/_out"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath,
      new java.io.File(s"$dir/events.parquet").toPath)
  }

  private def writeRawLong(dir: String): Unit = {
    import spark.implicits._
    writeSingleFile(micros.zipWithIndex
      .map { case (us, i) =>
        (i.toLong, us * 1000L, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      dir)
  }

  private def readNanos(dir: String): Seq[Long] =
    Tables.table(spark, dir, "events")
      .select("ts").collect().map(_.getLong(0)).sorted.toSeq

  test("TIMESTAMP(MICROS) parquet reads as exact nanosecond longs, " +
    "independent of session timezone") {
    val dir = writeDir("graft-ntz")
    writeNtz(dir)
    assert(readNanos(dir) == micros.map(_ * 1000L).sorted)
  }

  test("raw INT64-nanosecond parquet passes through unchanged") {
    val dir = writeDir("graft-rawns")
    writeRawLong(dir)
    assert(readNanos(dir) == micros.map(_ * 1000L).sorted)
  }

  test("streaming source canonicalizes ts identically to the batch " +
    "loader") {
    val dir = writeDir("graft-stream-ntz")
    writeNtz(dir)
    val streamed = streaming.StreamingOps.runToTable(
      streaming.StreamingOps.streamEvents(spark, dir)
        .select("event_id", "ts"), "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Tables.table(spark, dir, "events")
      .select("event_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._2) == micros.map(_ * 1000L).toSet)
  }

  test("an unexpected ts type fails loudly instead of mis-scaling") {
    import spark.implicits._
    val df = Seq((1L, "2020-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeEventTs(df))
    assert(e.getMessage.contains("ts"))
  }
}
