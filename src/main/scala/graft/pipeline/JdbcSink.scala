package graft.pipeline

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optional RDBMS serving sink — the S7 parity path for the reference's
  * Postgres deployment (models.py:74-141): upsert with COALESCE-merge
  * semantics, i.e. `ON CONFLICT (key) DO UPDATE SET col =
  * COALESCE(EXCLUDED.col, stored.col)` — an incoming row overwrites a
  * stored row's columns only where the incoming value is non-null, and
  * stored rows absent from the batch survive.
  *
  * Expressed engine-side (full-outer join + coalesce + atomic table
  * rewrite through `df.write.jdbc`) instead of db-side ON CONFLICT, so
  * it works against ANY JDBC target — Postgres, Derby, H2 — with no
  * dialect-specific SQL. The serving DB holds the resolved star schema
  * (12 small-to-medium tables), not the 28.8B-row staging data, so the
  * read-merge-rewrite is a small job; Parquet-native serving
  * (`CitationPipeline.build` + bucketed tables) remains the primary
  * path, this sink is the opt-in bridge for users running the
  * reference's RDBMS deployment.
  */
object JdbcSink {

  /** Upsert `df` into JDBC `table` keyed by `keys` with prefer-non-null
    * merge (A4/A5/U3 semantics, models.py:126-141). Creates the table
    * if absent. */
  def upsert(
      spark: SparkSession,
      df: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      props: Properties = new Properties): Unit = {
    require(keys.forall(df.columns.contains),
      s"upsert keys ${keys.mkString(",")} must exist in ${table}'s columns")
    val existing =
      try {
        val old = spark.read.jdbc(url, table, props)
        old.head(1) // force connection + schema resolution now
        Some(old)
      } catch { case _: Exception => None }
    val merged = existing match {
      case None => df
      case Some(old) =>
        val dataCols = df.columns.filterNot(keys.contains).toSeq
        val incoming = df.select(df.columns.toSeq.map(c =>
          if (keys.contains(c)) col(c) else col(c).as(s"_new_$c")): _*)
        old.join(incoming, keys, "full_outer")
          .select(keys.map(col) ++ dataCols.map(c =>
            coalesce(col(s"_new_$c"), col(c)).as(c)): _*)
    }
    // Materialize before the overwrite: the merged plan reads the very
    // table the write replaces.
    val out = merged.persist()
    out.count()
    out.write.mode("overwrite").jdbc(url, table, props)
    out.unpersist()
  }

  /** Link tables (no PK in models.py) are replaced wholesale. */
  def replace(
      df: DataFrame, url: String, table: String,
      props: Properties = new Properties): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  /** Upsert key per serving table: surrogate `id` where models.py has a
    * PK, the natural `revision_id` for revisions; link tables have no
    * key and are replaced. */
  val tableKeys: Map[String, Seq[String]] = Map(
    "containers" -> Seq("id"),
    "domains" -> Seq("id"),
    "documents" -> Seq("id"),
    "web_resources" -> Seq("id"),
    "normalized_citations" -> Seq("id"),
    "citation_instances" -> Seq("id"),
    "wiki_templates" -> Seq("id"),
    "revisions" -> Seq("revision_id"),
    "citation_history" -> Nil,
    "ncwr" -> Nil,
    "template_data" -> Nil)

  /** Ship the whole `Resolve.serve` star schema to a JDBC database. */
  def writeStarSchema(
      spark: SparkSession,
      tables: Map[String, DataFrame],
      url: String,
      props: Properties = new Properties): Unit =
    tables.foreach { case (name, df) =>
      tableKeys.getOrElse(name, Nil) match {
        case Nil => replace(df, url, name, props)
        case keys => upsert(spark, df, url, name, keys, props)
      }
    }
}
