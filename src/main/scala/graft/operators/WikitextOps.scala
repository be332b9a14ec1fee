package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.pipeline.CitationPipeline
import graft.queries.CitationQueries
import graft.sources.Revision

/** Driver-facing exercise of the wikitext pipeline (U1/U2 + S1-shaped
  * data + the dedup/query stack) over the testdata: each `documents` row
  * becomes a 2-revision page whose wikitext embeds one `<ref>` citation
  * and one standalone URL. Extraction counts are then exact functions of
  * `count(documents)`, so the DuckDB oracle can hash-check the whole
  * extract→normalize→dedup pipeline without being able to run it.
  */
object WikitextOps {

  type Q = (SparkSession, String) => DataFrame

  /** Two synthetic revisions per document; doc text is word-salad (no
    * wiki markup), so the only extractable constructs are the ones we
    * plant. */
  def syntheticRevisions(s: SparkSession, d: String): Dataset[Revision] = {
    import s.implicits._
    table(s, d, "documents").select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val ref = s"<ref name=r$id>{{Cite web |url=https://example.org/$id" +
          s" |title=Doc $id}}</ref>"
        val snippet = text.take(120)
        Seq(
          Revision(id.toInt, Some(0), id * 10 + 1, None,
            "2020-01-01 00:00:00", s"Intro. $ref $snippet"),
          Revision(id.toInt, Some(0), id * 10 + 2, Some(id * 10 + 1),
            "2020-02-01 00:00:00",
            s"Intro. $ref $snippet See https://example.org/extra/$id"))
      }
  }

  private def dedupedTables(s: SparkSession, d: String) = {
    // Persist the one expensive input; Spark's cache manager keys on the
    // canonicalized plan, so q45/q46 (and repeated bench runs) share one
    // extraction instead of re-running it per derived-table action.
    val ex = CitationPipeline
      .extractRows(syntheticRevisions(s, d), emitRefless = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CitationPipeline.dedup(CitationPipeline.stagingFromRows(ex))
  }

  // ---- staged pipeline tables -----------------------------------------
  // The extraction/normalization pipeline produces tables DuckDB cannot
  // derive itself (it can't run the wikitext extractor), which kept q46
  // (§3.2 flagship) and q47 (U1 stats) as weaker rows-only checks. Fix:
  // stage the four derived tables plus the raw extracted refs as parquet
  // under /tmp, have the Spark queries READ THE STAGED FILES, and hand the
  // driver oracle SQL over the very same files — the query semantics
  // (timeline windows, semi joins, history stats, grouping) become fully
  // hash-checkable, while extraction itself stays covered by q45's exact
  // cardinality oracle and the 15 golden normalizer tests.
  private val stagedTableNames = Seq("citation_instances",
    "normalized_citations", "citation_histories", "revisions")

  /** sf-keyed staging root — /tmp on this single-host harness (the
    * driver's DuckDB compare runs on the same machine); deployments where
    * the comparing process can't see /tmp can redirect it with the
    * `graft.stage.dir` system property. Keyed by sf name so a local
    * sf0.001 run can't clobber the driver's sf0.01 staging. */
  def stageRoot(d: String): String = {
    val base = sys.props.getOrElse("graft.stage.dir", "/tmp/graft_stage")
    s"$base/${new java.io.File(d).getName}"
  }

  /** Last staged root; `oracle` (a def, re-evaluated when Verify dumps
    * oracle_sql.json AFTER running the queries) points DuckDB at it. */
  @volatile private var stagedRoot: String = "/tmp/graft_stage/sf0.01"

  /** Point the staged-table oracles at `stageRoot(d)` WITHOUT running
    * the queries — for graft.DumpOracle, which dumps oracle_sql.json in
    * its own JVM (the staged parquet must already exist there, e.g.
    * written by a Bench/Verify run over the same sf dir). */
  def pointOracleAt(d: String): Unit = { stagedRoot = stageRoot(d) }
  private var stagedDirs: Set[String] = Set.empty

  private def staged(s: SparkSession, d: String): Map[String, DataFrame] =
    synchronized {
      val root = stageRoot(d)
      stagedRoot = root
      if (!stagedDirs.contains(root)) { // once per JVM; never reused across
        val t = dedupedTables(s, d)     // runs, so regenerated testdata can't
        stagedTableNames.foreach { n => // leave stale staging behind
          t(n).coalesce(1).write.mode("overwrite").parquet(s"$root/$n.parquet")
        }
        CitationPipeline.extractRefs(syntheticRevisions(s, d))
          .select(col("referenceType").cast("int").as("reference_type"),
            col("referenceNormalized").as("reference_normalized"))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$root/extracted_refs.parquet")
        stagedDirs += root
      }
      ((stagedTableNames :+ "extracted_refs")
        .map(n => n -> s.read.parquet(s"$root/$n.parquet"))).toMap
    }

  val queries: Map[String, Q] = Map(
    // ---- U1/U2/S1/A1/A2 end-to-end: pipeline table cardinalities ------
    // Per document: 1 shared <ref> across both revisions + 1 standalone
    // URL in rev 2 → 2 citation instances, 2 normalized citations,
    // 3 history rows, 2 revisions, 2 ncwr rows, 2 template params,
    // 3 web_resources (curid + ref URL + standalone URL); plus the
    // 2 global domains and 1 wiki_template.
    "q45_wikitext_pipeline" -> ((s, d) => {
      val t = dedupedTables(s, d)
      def n(name: String, as: String) =
        t(name).agg(count(lit(1)).as(as))
      n("citation_instances", "n_instances")
        .crossJoin(n("normalized_citations", "n_normalized"))
        .crossJoin(n("citation_histories", "n_histories"))
        .crossJoin(n("revisions", "n_revisions"))
        .crossJoin(n("ncwr", "n_ncwr"))
        .crossJoin(n("template_data", "n_template_data"))
        .crossJoin(n("web_resources", "n_web_resources"))
        .crossJoin(n("domains", "n_domains"))
        .crossJoin(n("wiki_templates", "n_wiki_templates"))
    }),

    // ---- §3.2 serving query over the staged corpus: Spark and the
    // DuckDB oracle read the SAME staged parquet, so the full output —
    // sha1 keys included (data, not DuckDB-computed) — hash-compares ----
    "q46_citations_at_revision" -> ((s, d) => {
      val t = staged(s, d)
      CitationQueries.citationsAtRevision(
        t("citation_instances"), t("normalized_citations"),
        t("citation_histories"), t("revisions"),
        pageId = 7, revisionId = Some(72L))
    }),

    // ---- all-pages batch citation report (no per-page driver probes):
    // each synthetic page's rev2 shows its <ref> and its standalone URL
    // → exactly one inline + one other citation per document ----------
    "q74_current_citations" -> ((s, d) => {
      // staged parquet, not a fresh extraction: q74 measures the report
      // JOIN shape; the pipeline itself is q45's job (r4 bench charged
      // q74 ~18 s of re-extraction because typed-flatMap plans don't
      // cache-key across separately built Dataset instances)
      val t = staged(s, d)
      CitationQueries.currentCitationsReport(
        t("citation_instances"), t("normalized_citations"),
        t("citation_histories"), t("revisions"))
        .groupBy("reference_type")
        .agg(count(lit(1)).as("n"))
    }),

    // ---- U1 at scale: normalize across the corpus, group by shape.
    // Aggregates over the staged extraction output; the length stats are
    // exact integers (sum, not float avg) so the hash compare can't drift
    // on summation order. avg derives from the exact pair in both engines.
    "q47_normalize_stats" -> ((s, d) => {
      staged(s, d)("extracted_refs")
        .groupBy("reference_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("reference_normalized")).as("n_distinct_norm"),
          sum(length(col("reference_normalized"))).as("sum_norm_len"),
          round(sum(length(col("reference_normalized"))).cast("double") /
            count(lit(1)), 4).as("avg_norm_len"))
    })
  )

  /** A def, not a val: re-evaluated when Verify dumps oracle_sql.json
    * (after the queries ran and staged their tables), so the staged-table
    * paths always name the sf of THIS run. */
  def oracle: Map[String, String] = {
    def p(n: String) = s"'$stagedRoot/$n.parquet/*.parquet'"
    Map(
    // §3.2 citations_at_revision re-expressed as plain SQL over the
    // staged tables: same timeline window, history stats, presence semi
    // join, and label/ordering semantics as CitationQueries (page 7 at
    // revision 72, limit 100).
    "q46_citations_at_revision" ->
      s"""WITH rev AS (SELECT page_id, revision_id, revision_timestamp
            FROM ${p("revisions")} WHERE page_id = 7),
          ch AS (SELECT page_id, raw_sha1, revision_id
            FROM ${p("citation_histories")} WHERE page_id = 7),
          timeline AS (SELECT page_id, revision_id,
            lead(revision_id) OVER (PARTITION BY page_id ORDER BY revision_id)
              AS next_revision_id,
            max(revision_id) OVER (PARTITION BY page_id) AS latest_rev
            FROM rev),
          present AS (SELECT DISTINCT page_id, raw_sha1 FROM ch
            WHERE revision_id = 72),
          stats AS (SELECT ch.page_id, ch.raw_sha1,
              min(r.revision_timestamp) AS first_seen,
              max(r.revision_timestamp) AS last_seen,
              min(ch.revision_id) AS first_seen_revision_id,
              max(ch.revision_id) AS last_seen_revision_id,
              count(*) AS appearance_count
            FROM ch JOIN rev r ON ch.revision_id = r.revision_id
            GROUP BY ch.page_id, ch.raw_sha1),
          flags AS (SELECT s.*, t.next_revision_id,
              s.last_seen_revision_id = t.latest_rev AS currently_visible
            FROM stats s JOIN timeline t
              ON s.last_seen_revision_id = t.revision_id)
          SELECT f.page_id, f.raw_sha1, ci.normalized_sha1,
            CASE WHEN ci.reference_type = 1 THEN 'inline'
                 WHEN ci.reference_type = 2 THEN 'endnote'
                 ELSE 'other' END AS reference_type,
            ci.reference_name, nc.reference_normalized,
            f.first_seen, f.last_seen,
            f.first_seen_revision_id, f.last_seen_revision_id,
            f.appearance_count, f.currently_visible,
            CASE WHEN f.currently_visible THEN NULL
                 ELSE f.next_revision_id END AS removed_at_revision_id
          FROM flags f
          JOIN present p ON f.page_id = p.page_id AND f.raw_sha1 = p.raw_sha1
          JOIN ${p("citation_instances")} ci
            ON f.page_id = ci.page_id AND f.raw_sha1 = ci.raw_sha1
          JOIN ${p("normalized_citations")} nc
            ON ci.normalized_sha1 = nc.normalized_sha1
          ORDER BY f.last_seen DESC, f.raw_sha1 ASC
          LIMIT 100""",
    "q47_normalize_stats" ->
      s"""SELECT reference_type, count(*) AS n,
            count(DISTINCT reference_normalized) AS n_distinct_norm,
            CAST(sum(length(reference_normalized)) AS BIGINT) AS sum_norm_len,
            round(CAST(sum(length(reference_normalized)) AS DOUBLE)
              / count(*), 4) AS avg_norm_len
          FROM ${p("extracted_refs")} GROUP BY reference_type""",
    "q74_current_citations" ->
      """SELECT 'inline' AS reference_type, count(*) AS n FROM documents
         UNION ALL
         SELECT 'other' AS reference_type, count(*) AS n FROM documents""",
    "q45_wikitext_pipeline" ->
      """SELECT count(*)*2 AS n_instances, count(*)*2 AS n_normalized,
         count(*)*3 AS n_histories, count(*)*2 AS n_revisions,
         count(*)*2 AS n_ncwr, count(*)*2 AS n_template_data,
         count(*)*3 AS n_web_resources,
         2 AS n_domains, 1 AS n_wiki_templates
         FROM documents"""
    )
  }
}
