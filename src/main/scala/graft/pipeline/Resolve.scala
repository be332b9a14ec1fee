package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The `resolve` job — replaces the reference's load phase
  * (load_all.py:533-591): converts the 11 deduped natural-key staging
  * tables into the 12-table serving star schema of models.py:18-572,
  * with surrogate integer ids and FK joins.
  *
  * Differences from the reference, by design (SURVEY.md §1.4, §7.1-6):
  *  - ids are DETERMINISTIC (dense sequence in natural-key order) rather
  *    than PG-autoincrement arbitrary — same input ⇒ same ids;
  *  - FK resolution is broadcast hash joins on natural keys, deleting
  *    the reference's chunked `IN (…)` round-trips (J11,
  *    load_all.py:137-151) and its driver-memory `page_to_doc_id` map
  *    (load_all.py:160-191 — the pipeline's stated scalability flaw);
  *  - id assignment uses sort + zipWithIndex (range-partitioned sort,
  *    per-partition offsets), NOT a global single-partition window —
  *    the difference between O(n/p) and O(n) memory per task at 28.8B
  *    rows.
  */
object Resolve {

  /** Dense 1-based id in `sortCols` order, distributed via
    * orderBy + zipWithIndex. */
  def withSequentialId(
      df: DataFrame, sortCols: Seq[String], idCol: String): DataFrame =
    withSequentialIdFrom(df, sortCols, idCol, 0L)

  /** Dense ids starting at `offset` + 1 (same mechanism). */
  def withSequentialIdFrom(
      df: DataFrame, sortCols: Seq[String], idCol: String,
      offset: Long): DataFrame = {
    val sorted = df.orderBy(sortCols.map(col): _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (offset + i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Incremental id assignment — the engine's form of the reference's
    * ON CONFLICT DO NOTHING load (models.py:74-141 driver,
    * load_all.py:115-526): rows of `delta` whose natural key already
    * exists in `existing` keep their existing id; genuinely new keys
    * get dense ids continuing after the current maximum. Existing ids
    * NEVER change, so an incremental run touches only the appended
    * slice — no full re-resolve of 28.8B rows per ingest.
    *
    * Returns existing ∪ newly-idd rows (same schema as `existing`). */
  def appendIds(
      existing: DataFrame, delta: DataFrame,
      naturalKey: Seq[String], idCol: String): DataFrame = {
    val fresh = delta
      .dropDuplicates(naturalKey)
      .join(existing.select(naturalKey.map(col): _*),
        naturalKey, "left_anti")
    val maxId = existing.agg(max(col(idCol))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val newRows =
      withSequentialIdFrom(fresh, naturalKey, idCol, maxId)
    existing.unionByName(
      newRows.select(existing.columns.toIndexedSeq.map(col): _*))
  }

  /** Deduped staging tables → serving star schema (models.py layout:
    * integer PKs, FK columns, md5 hash keys). */
  def serve(staged: Map[String, DataFrame]): Map[String, DataFrame] = {

    val containers = withSequentialId(
      staged("containers"), Seq("label"), "id")

    val domains = withSequentialId(staged("domains"), Seq("value"), "id")
      .join(broadcast(containers.select(col("label"),
        col("id").as("for_container"))),
        col("for_container_label") === col("label"), "left_outer")
      .select(col("id"), col("value"),
        // top_level_domain per models.py:148 (last dot-label).
        element_at(split(col("value"), "\\."), -1).as("top_level_domain"),
        col("for_container"))

    val documents = withSequentialId(
      staged("documents"), Seq("has_container_label", "page_id"), "id")
      .join(broadcast(containers.select(col("label"),
        col("id").as("has_container"))),
        col("has_container_label") === col("label"), "left_outer")
      .select(col("id"), col("language_code"), col("has_container"),
        col("page_id"))

    val docIds = documents.select(
      col("page_id").as("doc_page_id"), col("id").as("doc_id"))

    val webResources = withSequentialId(
      staged("web_resources"), Seq("url"), "id")
      .join(broadcast(domains.select(col("value"),
        col("id").as("domain_id"))),
        col("domain_label") === col("value"), "left_outer")
      .join(docIds, col("page_id") === col("doc_page_id"), "left_outer")
      .select(col("id"), col("url"), md5(col("url")).as("url_hash"),
        col("doc_id").as("instance_of_document"), col("domain_id"),
        col("numeric_page_id"), col("numeric_namespace_id"))

    val normalizedCitations = withSequentialId(
      staged("normalized_citations"), Seq("normalized_sha1"), "id")
      .join(docIds,
        col("appears_on_page_id") === col("doc_page_id"), "left_outer")
      .select(col("id"), col("normalized_sha1"),
        col("reference_normalized"),
        col("doc_id").as("appears_on_article"))

    val ncIds = normalizedCitations.select(
      col("normalized_sha1").as("nc_sha1"), col("id").as("normalized_id"))

    val citationInstances = withSequentialId(
      staged("citation_instances"), Seq("page_id", "raw_sha1"), "id")
      .join(ncIds, col("normalized_sha1") === col("nc_sha1"))
      .select(col("id"), col("normalized_id"), col("page_id"),
        col("raw_sha1"), col("reference_type"), col("reference_name"))

    val ciIds = citationInstances.select(
      col("page_id").as("ci_page_id"), col("raw_sha1").as("ci_raw_sha1"),
      col("id").as("citation_instance_id"))

    val revisions = staged("revisions").select(
      col("revision_id"), col("page_id"), col("parent_revision_id"),
      col("revision_timestamp"))

    // The one big-big resolution: (page_id, raw_sha1) → instance id.
    // Both sides hash-partition on page_id-prefixed keys (SURVEY §7.1-6).
    val citationHistory = staged("citation_histories")
      .join(ciIds, col("page_id") === col("ci_page_id") &&
        col("raw_sha1") === col("ci_raw_sha1"))
      .select(col("citation_instance_id"), col("revision_id"))

    val wrIds = webResources.select(
      col("url").as("wr_url"), col("id").as("web_resource_id"))

    val ncwr = staged("ncwr")
      .join(ncIds, col("normalized_sha1") === col("nc_sha1"))
      .join(wrIds, col("url") === col("wr_url"))
      .select(col("normalized_id"), col("web_resource_id"))

    val wtWithId = withSequentialId(
      staged("wiki_templates"), Seq("domain_label", "name"), "id")

    val wikiTemplates = wtWithId
      .join(broadcast(domains.select(col("value"),
        col("id").as("domain_id"))),
        col("domain_label") === col("value"), "left_outer")
      .select(col("id"), col("domain_id").as("domain"), col("name"))

    val wtIds = wtWithId.select(
      col("domain_label").as("wt_domain"), col("name").as("wt_name"),
      col("id").as("wiki_template_id"))

    val templateData = staged("template_data")
      .join(wtIds, col("domain_label") === col("wt_domain") &&
        col("template_name") === col("wt_name"))
      .join(ncIds, col("normalized_sha1") === col("nc_sha1"))
      .select(col("wiki_template_id"), col("normalized_id"),
        col("offset_start"), col("parameter_key"),
        md5(col("parameter_key")).as("parameter_key_md5"),
        col("parameter_value"))

    Map(
      "containers" -> containers,
      "domains" -> domains,
      "documents" -> documents,
      "web_resources" -> webResources,
      "normalized_citations" -> normalizedCitations,
      "citation_instances" -> citationInstances,
      "revisions" -> revisions,
      "citation_history" -> citationHistory,
      "ncwr" -> ncwr,
      "wiki_templates" -> wikiTemplates,
      "template_data" -> templateData)
  }
}
