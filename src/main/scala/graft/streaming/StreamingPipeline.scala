package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.CitationPipeline
import graft.sources.Revision

/** Incremental citation pipeline: continuous ingestion of newly
  * arriving `.mwrev.zst` bundles via the mwrev MicroBatchStream.
  *
  * Each micro-batch extracts its revisions (same typed flatMap as the
  * batch pipeline) and APPENDS to the staged-refs parquet set; the
  * checkpoint guarantees each bundle is read once across restarts.
  * Batch-side retries can at worst re-append — and the downstream
  * table derivation dedups on content-addressed natural keys, so
  * re-appends are absorbed exactly like the reference's idempotent
  * ON-CONFLICT upserts (README.md:66, models.py:68-71). Run
  * `refreshTables` after (or on a schedule) to republish the 11
  * deduped tables.
  */
object StreamingPipeline {

  /** Process all currently unprocessed bundles, then return. Call
    * repeatedly (or schedule) for continuous ingestion; the checkpoint
    * under `outDir/_checkpoint` carries the high-water mark. */
  def ingestAvailable(
      spark: SparkSession, bundleGlob: String, outDir: String,
      domain: String = "en.wikipedia.org"): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val stream = spark.readStream.format("mwrev").load(bundleGlob)
      .select(
        col("page_id").as("pageId"),
        col("namespace_id").as("namespaceId"),
        col("revision_id").as("revisionId"),
        col("parent_revision_id").as("parentRevisionId"),
        col("revision_timestamp").as("revisionTimestamp"),
        col("revision_text").as("revisionText"))
      .as[Revision]
    val q = stream.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Revision],
          batchId: Long) =>
        CitationPipeline
          .extractRows(batch, domain, emitRefless = true)
          .write.mode("append").option("compression", "zstd")
          .parquet(s"$outDir/_staged_refs")
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Republish the 11 deduped tables from the accumulated staging set
    * (dedup-on-read absorbs any at-least-once re-appends). */
  def refreshTables(
      spark: SparkSession, outDir: String,
      domain: String = "en.wikipedia.org"): Map[String, DataFrame] = {
    import spark.implicits._
    val staged = spark.read
      .parquet(s"$outDir/_staged_refs")
      .as[graft.pipeline.ExtractedRow]
    val tables =
      CitationPipeline.dedup(CitationPipeline.stagingFromRows(staged, domain))
    CitationPipeline.writeTables(tables, outDir)
    tables
  }
}
