package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The sweep must enumerate exactly the pairs the brute-force
  * cross-join enumerates — for any range count, including ranges much
  * narrower than an island (multi-range carries), a single range (no
  * carries at all), and boundary-touching intervals (end exclusive:
  * a.e == b.s is NOT an overlap).
  */
class IntervalSweepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.shuffle.partitions", "7")
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  /** Deterministic fixture: 600 islands over 60 users on a dense time
    * axis. Lengths/gaps from modular arithmetic so users collide hard:
    * many concurrent islands, exact-touch boundaries (e == next s),
    * same-start ties across users, and per-user islands disjoint by
    * construction (cursor advances past each island's end). */
  private def islands(): DataFrame = {
    import spark.implicits._
    val rows = (0L until 60L).flatMap { u =>
      var cursor = u * 7 % 13 + (u * u % 31)
      (0L until 10L).map { i =>
        val s = cursor
        val len = 23 + (u * 11 + i * 5) % 140
        val gap = 1 + (u + i * 3) % 60 // >=1: per-user disjoint, often touching-adjacent across users
        cursor = s + len + gap
        (u, s, s + len)
      }
    }
    rows.toDF("user_id", "s", "e")
  }

  private def brute(iv: DataFrame, probeMod: Long): DataFrame = {
    val a = iv.select(col("user_id").as("u1"), col("s").as("a_s"),
      col("e").as("a_e")).filter(col("u1") % probeMod === 0)
    val b = iv.select(col("user_id").as("u2"), col("s").as("b_s"),
      col("e").as("b_e"))
    a.crossJoin(b)
      .filter(col("u1") < col("u2") &&
        col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .groupBy("u1", "u2")
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_ns"))
  }

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    val g = got.orderBy("u1", "u2").collect().toSeq
    val w = want.orderBy("u1", "u2").collect().toSeq
    assert(g == w)
  }

  test("sweep == brute force on the colliding fixture") {
    val iv = islands()
    assertSame(IntervalSweep.overlapPairs(iv, 5L), brute(iv, 5L))
  }

  test("range width narrower than islands (every island carries)") {
    val iv = islands()
    assertSame(IntervalSweep.overlapPairs(iv, 5L, nRanges = 997),
      brute(iv, 5L))
  }

  test("single range (no carries)") {
    val iv = islands()
    assertSame(IntervalSweep.overlapPairs(iv, 5L, nRanges = 1),
      brute(iv, 5L))
  }

  test("probeMod 1 keeps every u1<u2 pair once") {
    val iv = islands()
    assertSame(IntervalSweep.overlapPairs(iv, 1L), brute(iv, 1L))
  }

  test("exact touch is not an overlap; strict overlap of 1 unit is") {
    import spark.implicits._
    val iv = Seq((0L, 0L, 10L), (1L, 10L, 20L), (2L, 19L, 30L))
      .toDF("user_id", "s", "e")
    val got = IntervalSweep.overlapPairs(iv, 1L)
      .orderBy("u1", "u2").collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))) == Seq((1L, 2L, 1L, 1L)))
  }
}
