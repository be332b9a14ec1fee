package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native `minhash_sigs` Expression must be bit-identical to the
  * relational explode + min-aggregate formulation it replaced (which
  * is also exactly what the q36 DuckDB oracle still runs), and the
  * rewritten signature stage must be map-only (no Exchange).
  */
class MinHashSigsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  private def words(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), " "), w => w =!= "")

  test("native minhash_sigs equals the relational explode+min form") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .withColumn("tokens", words(col("text")))
      .filter(size(col("tokens")) >= 3)
    val relational = docs
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(tokens) - 3),
           i -> concat_ws(' ', slice(tokens, i + 1, 3)))"""))
        .as("shingle"))
      .groupBy("doc_id")
      .agg(
        min(substring(md5(col("shingle")), 1, 8)).as("sig0"),
        min(substring(md5(col("shingle")), 9, 8)).as("sig1"),
        min(substring(md5(col("shingle")), 17, 8)).as("sig2"),
        min(substring(md5(col("shingle")), 25, 8)).as("sig3"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
      .toSet
    val native = graft.SparkEntry.queries("q36_minhash_sig")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
      .toSet
    assert(native == relational && native.nonEmpty)
  }

  test("the native signature stage is map-only (no Exchange, no " +
    "Aggregate)") {
    val plan = graft.SparkEntry.queries("q36_minhash_sig")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }

  test("NULL tokens follow concat_ws skip-null semantics bit-exactly") {
    // A null token must contribute neither bytes nor a separator —
    // exactly what concat_ws(' ', slice(tokens, i+1, 3)) computes — so
    // a caller with nullable arrays is not silently divergent from the
    // relational form the kernel claims bit-parity with.
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[String]("alpha", null, "gamma", "delta")),
      (2L, Seq[String](null, null, "solo", "x", null)),
      (3L, Seq[String]("a", "b", "c")))
    val df = rows.toDF("id", "tokens")
    val native = df
      .select(col("id"), expr("minhash_sigs(tokens)").as("sigs"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val relational = df
      .select(col("id"), explode(expr(
        """transform(sequence(0, size(tokens) - 3),
           i -> concat_ws(' ', slice(tokens, i + 1, 3)))"""))
        .as("shingle"))
      .groupBy("id")
      .agg(array(
        min(substring(md5(col("shingle")), 1, 8)),
        min(substring(md5(col("shingle")), 9, 8)),
        min(substring(md5(col("shingle")), 17, 8)),
        min(substring(md5(col("shingle")), 25, 8))).as("sigs"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(native == relational && native.size == 3)
  }

  test("arrays with fewer than 3 tokens yield NULL (no shingles)") {
    import spark.implicits._
    val out = Seq("one two", "a b c").toDF("text")
      .select(expr(
        "minhash_sigs(filter(split(lower(text), ' '), w -> w != ''))")
        .as("sigs"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0) && out(1).getSeq[String](0).size == 4)
  }
}
