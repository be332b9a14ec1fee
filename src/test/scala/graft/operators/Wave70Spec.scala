package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-70 index-structure operators (q327–q328);
  * the DuckDB oracle separately hash-checks exact values at the gate
  * SFs.
  */
class Wave70Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q327 matches a sequential phrase-scan recompute") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)))
      .filter(_._2.length >= 3)
    val sh = docs.flatMap { case (id, t) =>
      (0 to t.length - 3).map(i =>
        (id, i.toLong, t.slice(i, i + 3).mkString(" ")))
    }
    val counts = sh.groupBy(_._3).map { case (p, g) =>
      (p, g.size.toLong)
    }
    val (phrase, nTotal) = counts.toSeq.minBy(t => (-t._2, t._1))
    val expected = sh.filter(_._3 == phrase).groupBy(_._1)
      .map { case (id, g) =>
        (id, g.size.toLong, g.map(_._2).min, nTotal)
      }.toSet
    val got = graft.SparkEntry
      .queries("q327_phrase_occurrences")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // Occurrence counts sum back to the phrase's corpus total.
    assert(got.toSeq.map(_._2).sum == nTotal)
  }

  test("q328 equals brute-force distinct-user intersections") {
    val ev = graft.Tables.table(spark, sf, "events")
      .selectExpr("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1).map { case (t, g) =>
      t -> g.map(_._2).toSet
    }
    val types = byType.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
      na = byType(a).size.toLong
      nb = byType(b).size.toLong
      nBoth = (byType(a) & byType(b)).size.toLong
    } yield (a, b, nBoth, na, nb,
      nBoth * 1000000L / (na + nb - nBoth))).toSet
    val got = graft.SparkEntry
      .queries("q328_bitmap_intersections")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }
}
