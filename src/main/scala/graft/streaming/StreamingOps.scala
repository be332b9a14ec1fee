package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table. The reference
  * is pure batch (SURVEY.md §2.10) — these are the engine's streaming
  * extension: the same event-time aggregations expressed as incremental
  * queries, verified against the batch oracle (a streaming run with
  * `Trigger.AvailableNow` over a static directory must produce exactly
  * the batch answer).
  *
  * Scale: the file source feeds one task per file; windowed aggregation
  * state is partitioned by (window, key) in the state store; watermarks
  * bound that state. `dsum` keeps money sums exact and
  * order-independent, so results are stable under any microbatch split.
  */
object StreamingOps {

  type Q = (SparkSession, String) => DataFrame

  private val seq = new AtomicInteger()

  /** events schema — ts read as nanosecond long
    * (spark.sql.legacy.parquet.nanosAsLong, see Tables.table). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def streamEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file source wants a directory; select the single events file
    // via a glob filter.
    s.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  /** Drain a streaming DataFrame into an in-memory table with
    * AvailableNow and return the final result. */
  def runToTable(df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${seq.incrementAndGet()}"
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Event-time hourly windowed aggregation with a watermark — the
    * streaming twin of q28 (its DuckDB oracle is the correctness
    * check). Complete mode so every window reaches the sink. */
  def windowedAgg(s: SparkSession, dir: String): DataFrame = {
    val agg = streamEvents(s, dir)
      .withColumn("etime", timestamp_seconds(expr("ts div 1000000000")))
      .withWatermark("etime", "1 hour")
      .groupBy(window(col("etime"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
    runToTable(agg, "complete")
  }

  /** Streaming stateful dedup (dropDuplicates over an unbounded key
    * stream). */
  def streamingDedup(s: SparkSession, dir: String): DataFrame = {
    val deduped = streamEvents(s, dir)
      .select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
    runToTable(deduped, "append")
  }

  val queries: Map[String, Q] = Map(
    "q52_stream_window" -> ((s, d) => windowedAgg(s, d)),
    "q53_stream_dedup" -> ((s, d) => streamingDedup(s, d)))

  val oracle: Map[String, String] = Map(
    // Identical to the q28 batch oracle — stream == batch equivalence.
    "q52_stream_window" ->
      """SELECT strftime(make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000),
                         '%Y-%m-%d %H:%M:%S') AS hour,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q53_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events")
}
