package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native simhash_planes kernel against the relational
  * explode + 64-aggregate formulation it replaced — bit-for-bit, on
  * real corpus text and on synthetic edge cases.
  */
class SimHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  /** The ORIGINAL relational form: explode tokens, 64 sign-sums. */
  private def relationalPlanes = {
    val toks = graft.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), w -> w != '')"))
          .as("tok"))
      .withColumn("h", md5(col("tok")))
    val sums = for (j <- 0 to 3; i <- 1 to 16) yield
      sum(when((shiftright(conv(substring(col("h"), i, 1), 16, 10)
        .cast("int"), j) % 2) === 1, 1).otherwise(-1)).as(s"s${j}_$i")
    toks.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id") +: (0 to 3).map(j =>
        concat((1 to 16).map(i =>
          when(col(s"s${j}_$i") > 0, "1").otherwise("0")): _*)
          .as(s"p$j")): _*)
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("native kernel == relational explode+aggregate on the corpus") {
    val native = graft.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), w -> w != '')").as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), expr("simhash_planes(tk)").as("pl"))
      .selectExpr("doc_id", "pl[0] AS p0", "pl[1] AS p1", "pl[2] AS p2",
        "pl[3] AS p3")
      .collect().map(_.toSeq).toSet
    val relational = relationalPlanes.collect().map(_.toSeq).toSet
    assert(native == relational)
    assert(native.nonEmpty)
  }

  test("edge cases: empty array, single token, null token") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("hello")),
      (2L, Seq.empty[String]),
      (3L, Seq("a", "a", "b"))).toDF("id", "tk")
      .select(col("id"), expr("simhash_planes(tk)").as("pl"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // empty input: all counters 0, sign(0) = '0'
    assert(df(2L).forall(_ == "0" * 16))
    // single token: plane bits equal the token's own md5 digit bits
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8"))
    val digits = h.take(8).flatMap(b => Seq((b >> 4) & 0xf, b & 0xf))
    (0 to 3).foreach { j =>
      val want = digits.map(d => if (((d >> j) & 1) == 1) '1' else '0')
        .mkString
      assert(df(1L)(j) == want, s"plane $j")
    }
    // duplicate tokens accumulate (multiset semantics): 2×'a' outvotes
    // 1×'b' wherever their bits differ
    val ha = java.security.MessageDigest.getInstance("MD5")
      .digest("a".getBytes("UTF-8"))
    val da = ha.take(8).flatMap(b => Seq((b >> 4) & 0xf, b & 0xf))
    (0 to 3).foreach { j =>
      val want = da.map(d => if (((d >> j) & 1) == 1) '1' else '0')
        .mkString
      // with 2 votes for a's bit and 1 against, a's bit always wins
      // when they disagree; when they agree sum=±3 keeps the bit too —
      // except agree-on-0 stays '0'. So the result equals a's plane
      // wherever a's bit is 1, and is '0' where a's bit is 0 and b's
      // bit is 0; where a=0, b=1 the sum is -2+1 = -1 → '0'.
      val got = df(3L)(j)
      want.zip(got).zipWithIndex.foreach { case ((wa, g), i) =>
        if (wa == '1') assert(g == '1', s"plane $j bit $i")
        else assert(g == '0', s"plane $j bit $i")
      }
    }
  }
}
