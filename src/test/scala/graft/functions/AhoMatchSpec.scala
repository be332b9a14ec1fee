package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `aho_match` SQL-surface contract: one-scan multi-pattern matching
  * available from plain SQL, equal to per-pattern contains() semantics.
  */
class AhoMatchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.shuffle.partitions", "2")
    GraftFunctions.register(s)
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("aho_match returns matched patterns in pattern order from SQL") {
    val rows = spark.sql(
      """SELECT aho_match(t, array('he', 'she', 'his', 'hers')) AS m
         FROM VALUES ('ushers'), ('hishers'), ('xyz'), (NULL) AS v(t)
         ORDER BY t NULLS LAST""")
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(rows(0).toSeq == Seq("he", "she", "his", "hers")) // hishers
    assert(rows(1).toSeq == Seq("he", "she", "hers")) // ushers
    assert(rows(2).toSeq == Seq.empty)
    assert(rows(3) == null)
  }

  test("aho_match equals per-pattern contains() on random inputs, " +
    "including non-literal pattern columns") {
    val rnd = new scala.util.Random(41)
    val pats = Seq("ab", "ba", "aab", "bbb", "abab")
    val texts = (1 to 200).map(_ =>
      (1 to rnd.nextInt(30)).map(_ => "ab" (rnd.nextInt(2))).mkString)
    import spark.implicits._
    val df = texts.toDF("t")
    df.createOrReplaceTempView("aho_rand")
    val got = spark.sql(
      s"""SELECT t, aho_match(t, array(${pats.map("'" + _ + "'").mkString(",")})) AS m
          FROM aho_rand""")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet)
    got.foreach { case (t, m) =>
      assert(m == pats.filter(t.contains(_)).toSet, s"text=$t")
    }
    // non-literal patterns: per-row arrays still evaluate correctly
    // (content-revalidated cache)
    val mixed = spark.sql(
      """SELECT aho_match('abcabc', CASE WHEN i % 2 = 0
                 THEN array('abc', 'ca') ELSE array('b', 'cab') END) AS m
         FROM VALUES (0), (1), (2), (3) AS v(i) ORDER BY i""")
      .collect().map(_.getSeq[String](0).toSet)
    assert(mixed.toSeq ==
      Seq(Set("abc", "ca"), Set("b", "cab"), Set("abc", "ca"), Set("b", "cab")))
  }
}
