package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-5 wave 33: physical-layout planning.
  *
  *   - q248 range-partition plan from a deterministic sample: split
  *     points from a bottom-k-by-hash sample of the key column, then
  *     an exact per-range occupancy/skew audit — the planning pass a
  *     range-partitioned 100 TB write runs before shuffling anything.
  */
object Wave33Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Target partitions and sample size (k = 32·P, the classic
    * RangePartitioner sketch density). */
  private val P = 8
  private val K = 256

  val queries: Map[String, Q] = Map(
    // ---- q248: range-partition planning audit --------------------------
    // The sample is the K rows with the smallest md5(event_id) — a
    // deterministic simple random sample (TakeOrdered: map-side top-K
    // per partition, K-row merge — never a corpus sort). Split points
    // are the sample's P-quantile values; every corpus row then buckets
    // map-side against the broadcast 7-value split array, and ONE
    // bucket-keyed count yields the occupancy audit with skew in ppm
    // of the ideal share. This is exactly how Spark's own
    // RangePartitioner plans a range shuffle — expressed as an
    // auditable query whose skew column tells you BEFORE the 100 TB
    // write whether the key needs salting.
    "q248_range_plan" -> ((s, d) => {
      val ev = table(s, d, "events").select(col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
        expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 13)," +
          " 16, 10) AS BIGINT)").as("h"))
      // event_id tie-break: a 52-bit hash prefix can collide at the
      // K boundary, and an untied LIMIT would let each engine pick a
      // different sample.
      val sample = ev.orderBy("h", "event_id").limit(K).select("cents")
      val splits = sample
        .withColumn("rn", row_number().over(Window.orderBy("cents")))
        .filter(col("rn") % (K / P) === 0 && col("rn") < K)
        .agg(sort_array(collect_list("cents")).as("splits"))
      val tot = ev.agg(count(lit(1)).as("n_total"))
      ev.crossJoin(broadcast(splits))
        .select(expr("size(filter(splits, x -> x <= cents))")
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_rows"),
          expr(s"n_rows * ${P}L * 1000000L div n_total").as("share_ppm"))
    }))

  val oracle: Map[String, String] = Map(
    "q248_range_plan" ->
      """WITH ev AS (
           SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents,
                  CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                    1, 13)) AS BIGINT) AS h
           FROM events),
         sample AS (SELECT cents FROM ev ORDER BY h, event_id LIMIT 256),
         ranked AS (
           SELECT cents, row_number() OVER (ORDER BY cents) AS rn
           FROM sample),
         splits AS (
           SELECT list_sort(list(cents)) AS sp FROM ranked
           WHERE rn % 32 = 0 AND rn < 256),
         b AS (
           SELECT len(list_filter(sp, x -> x <= cents)) AS bucket
           FROM ev CROSS JOIN splits),
         tot AS (SELECT count(*) AS n_total FROM ev)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(*) * 8 * 1000000 // n_total AS BIGINT)
                  AS share_ppm
         FROM b CROSS JOIN tot GROUP BY bucket, n_total""")
}
