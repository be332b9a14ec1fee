package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table; schemas are carried by the files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One-call SQL surface: registers every table as a temp view plus
    * the native graft functions (array_dot, nfc_normalize, …), so the
    * whole corpus is queryable via `spark.sql` — the `spark-sql`-shell
    * equivalent of the reference's DuckDB session over its parquet. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
      // (micros) refuses by default; read it as a long (ns since epoch) and
      // do exact integer-nanosecond arithmetic downstream.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
