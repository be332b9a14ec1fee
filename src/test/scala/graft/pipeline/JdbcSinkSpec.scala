package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** S7 RDBMS serving sink against an embedded Derby database (the
  * JDBC-standard stand-in for the reference's Postgres): COALESCE-merge
  * upsert semantics per models.py:126-141.
  */
class JdbcSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.shuffle.partitions", "2")
    s
  }

  private lazy val url = {
    val dir = Files.createTempDirectory("graft-derby").toFile
    dir.delete() // Derby wants to create the directory itself
    s"jdbc:derby:${dir.getAbsolutePath};create=true"
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("upsert: insert, COALESCE-merge, survivor rows") {
    import spark.implicits._

    // Initial load creates the table.
    val v1 = Seq(
      (1L, Some("alpha"), Some(10)),
      (2L, Some("beta"), Some(20)),
      (3L, None: Option[String], Some(30)))
      .toDF("id", "name", "score")
    JdbcSink.upsert(spark, v1, url, "things", Seq("id"))
    assert(spark.read.jdbc(url, "things", new java.util.Properties)
      .count() == 3)

    // Delta: id=2 updates name but carries NULL score (must keep 20);
    // id=3 fills the missing name; id=4 is new; id=1 absent (survives).
    val v2 = Seq(
      (2L, Some("BETA"), None: Option[Int]),
      (3L, Some("gamma"), None: Option[Int]),
      (4L, Some("delta"), Some(40)))
      .toDF("id", "name", "score")
    JdbcSink.upsert(spark, v2, url, "things", Seq("id"))

    val got = spark.read.jdbc(url, "things", new java.util.Properties)
      .collect()
      .map(r => (r.getLong(0),
        Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("alpha"), Some(10)), // untouched survivor
      (2L, Some("BETA"), Some(20)),  // name updated, null did NOT erase
      (3L, Some("gamma"), Some(30)), // non-null fills the gap
      (4L, Some("delta"), Some(40)))) // inserted
  }

  test("writeStarSchema ships Resolve output; link tables replaced") {
    import spark.implicits._
    val tables = Map(
      "containers" -> Seq((1L, "en.wikipedia.org")).toDF("id", "label"),
      "ncwr" -> Seq((1L, 7L), (2L, 8L)).toDF(
        "normalized_id", "web_resource_id"))
    JdbcSink.writeStarSchema(spark, tables, url)
    assert(spark.read.jdbc(url, "containers", new java.util.Properties)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "en.wikipedia.org")))
    // replace-wholesale: a second write with fewer rows leaves no ghosts
    JdbcSink.writeStarSchema(spark,
      Map("ncwr" -> Seq((9L, 9L)).toDF("normalized_id", "web_resource_id")),
      url)
    assert(spark.read.jdbc(url, "ncwr", new java.util.Properties)
      .collect().map(_.getLong(0)).toSeq == Seq(9L))
  }
}
