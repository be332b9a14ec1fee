package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.table

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode/feature steps run
  * per-partition over batches (the Scala analogue of an arrow-batched
  * UDF), so adding a real image/audio decoder later only swaps the
  * `decodeStub` body — schema, partitioning and batch shape stay put.
  *
  * No media libraries ship in this environment, so the decoder is a
  * deterministic STUB: it derives fake width/height/frame metadata from
  * payload bytes. The Spark-side contract (binary column + struct
  * metadata + mapPartitions batch processing) is real and tested.
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** Assets table synthesized from documents: payload = utf-8 bytes. */
  def assets(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(col("doc_id").as("asset_id"),
        col("text").cast("binary").as("payload"),
        struct(col("lang").as("media_lang"),
          col("source").as("origin"),
          octet_length(col("text")).as("n_bytes")).as("meta"))

  /** STUB decoder: replace with a real media decode; deterministic fake
    * dimensions derived from the payload so tests can pin outputs. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (64 + n % 577, 64 + (n * 31) % 577, 1 + n % 7)
  }

  private val decodedSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Per-partition batch decode over the binary payloads (mapPartitions
    * keeps one decoder instance per task — the shape a JNI/native decoder
    * needs). */
  def decoded(s: SparkSession, d: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    assets(s, d)
      .select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, f) = decodeStub(payload)
          Row(id, payload.length, w, h, f)
        }
      }(enc)
  }

  val queries: Map[String, Q] = Map(
    // ---- binary payload + metadata extraction (stubbed decode) ---------
    // Expressed relationally so the oracle can check the metadata math the
    // stub uses; the mapPartitions path is covered by MultimodalSpec.
    "q43_binary_meta" -> ((s, d) => {
      table(s, d, "documents")
        .withColumn("n_bytes", octet_length(col("text")))
        .select(col("doc_id"),
          col("n_bytes"),
          (lit(64) + col("n_bytes") % 577).as("width"),
          (lit(64) + (col("n_bytes") * 31) % 577).as("height"),
          (lit(1) + col("n_bytes") % 7).as("n_frames"))
    }),

    // ---- modality join: document text + embedding enrichment -----------
    "q44_modality_join" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val emb = table(s, d, "embeddings")
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .groupBy("lang", "label")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q43_binary_meta" ->
      """SELECT doc_id, n_bytes,
         64 + n_bytes % 577 AS width,
         64 + (n_bytes * 31) % 577 AS height,
         1 + n_bytes % 7 AS n_frames
         FROM (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)""",
    "q44_modality_join" ->
      """SELECT lang, label, count(*) AS n, sum(n_chars) AS total_chars
         FROM documents JOIN embeddings ON doc_id = vec_id
         GROUP BY lang, label"""
  )
}
