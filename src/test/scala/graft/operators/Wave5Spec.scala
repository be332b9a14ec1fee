package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-5 operators: salted skew join (q156),
  * bigram-LM fluency scoring (q157), native NFC normalization (q158),
  * tombstone purge propagation (q159) and exact prefix-filtered
  * Jaccard self-join (q160). The DuckDB oracle checks exact values;
  * these pin the invariants that keep the operators correct at any
  * scale — in particular that the two candidate-pruned operators
  * (q156's salting, q160's prefix filter) produce results IDENTICAL
  * to their unpruned definitions.
  */
class Wave5Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    graft.functions.GraftFunctions.register(s)
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q156 salted join: identical to the plain unsalted join") {
    val salted = RelationalOps.queries("q156_salted_join")(spark, sf)
    val left = graft.Tables.table(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(pmod(col("l_partkey"), lit(50)).as("k"), col("l_quantity"))
    val plain = left
      .join(graft.Tables.table(spark, sf, "supplier")
        .select(pmod(col("s_suppkey"), lit(50)).as("k"), col("s_acctbal")),
        Seq("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double")
          .as("sum_bal"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q156: factorized plan — the pair stream never materializes") {
    // Round 7 replaced the literal salted pair join with the algebraic
    // factorization (aggregate each side per key, broadcast-combine):
    // the sf1 run measured the pair stream at 15× for 10× data — nl·nr
    // rows per key by construction — while the factorized plan is two
    // linear scans with the SAME output (the equivalence test above
    // compares against the literal pair-join definition). The plan
    // must therefore carry the per-side aggregates BELOW the join and
    // no (k, salt) pair exchange anywhere.
    val df = RelationalOps.queries("q156_salted_join")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("salt"), "the salted pair join is gone")
    // both sides aggregate before the combine join
    assert(plan.contains("partial_count"), plan.linesIterator.take(5)
      .mkString("\n"))
  }

  test("q157 bigram LM: repeated text scores above unique text") {
    val rows = TextOps.queries("q157_bigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every score is a log-probability: strictly negative micro-nats
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bg")
      val avg = r.getAs[Long]("avg_micro")
      assert(n >= 1L)
      assert(avg < 0L, s"log-prob must be negative, got $avg")
      // avg is the floor of sum/n, so it can't be below min micro ≈
      // ln(0.5 / (c1 + 0.5V)) — bound loosely by -30 nats
      assert(avg > -30000000L)
    }
  }

  test("q158 NFC: composes decomposed sequences, idempotent, fast-path-safe") {
    import spark.implicits._
    val dec = "cafe\u0301"   // e + combining acute (decomposed)
    val comp = "caf\u00e9"   // precomposed é
    val decN = "nin\u0303o"  // n + combining tilde
    val compN = "ni\u00f1o"
    val out = Seq(dec, comp, "plain ascii", decN)
      .toDF("s")
      .selectExpr("nfc_normalize(s) AS n", "s")
      .collect().map(r => (r.getString(1), r.getString(0))).toMap
    assert(out(dec) == comp)
    assert(out(comp) == comp) // already composed: unchanged
    assert(out("plain ascii") == "plain ascii")
    assert(out(decN) == compN)
    // idempotence
    val twice = Seq(dec).toDF("s")
      .selectExpr("nfc_normalize(nfc_normalize(s)) AS n").head.getString(0)
    assert(twice == comp)
    // null propagates, no NPE
    val n = Seq[Option[String]](None).toDF("s")
      .selectExpr("nfc_normalize(s) AS n").head
    assert(n.isNullAt(0))
  }

  test("q158: interpreted and codegen paths agree") {
    import spark.implicits._
    val df = Seq("cafe\u0301 nin\u0303o", "a\u030ab\u0308c", "mixed caf\u00e9")
      .toDF("s")
    val gen = df.selectExpr("nfc_normalize(s)").collect().map(_.getString(0))
    val interp = df.collect().map(r =>
      graft.functions.NfcNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(r.getString(0)))
        .eval(null).toString)
    assert(gen.toSeq == interp.toSeq)
  }

  test("q159 tombstone purge: audit rows balance and match the tombstone set") {
    val rows = AuditOps.queries("q159_tombstone_purge")(spark, sf)
      .collect().map(r => r.getAs[String]("table_name") ->
        ((r.getAs[Long]("n_before"), r.getAs[Long]("n_after"),
          r.getAs[Long]("n_purged")))).toMap
    assert(rows.keySet == Set("documents", "embeddings"))
    rows.values.foreach { case (before, after, purged) =>
      assert(before == after + purged)
      assert(purged > 0L, "the sf0.001 corpus must contain tombstoned ids")
    }
    val docTomb = graft.Tables.table(spark, sf, "documents")
      .filter(pmod(col("doc_id"), lit(13)) === 0).count()
    assert(rows("documents")._3 == docTomb)
  }

  test("q160 prefix-filtered join: identical to brute-force exact Jaccard") {
    val pruned = TextOps.queries("q160_prefix_jaccard_join")(spark, sf)
    // independent brute force: all candidate pairs via full token join
    val sets = graft.Tables.table(spark, sf, "documents")
      .filter(pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id"), explode(
        filter(split(lower(col("text")), " "), w => w =!= "")).as("tok"))
      .distinct()
    val sz = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sets.as("a").join(sets.as("b"), Seq("tok"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sz.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 5 >= col("uni") * 4)
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double") / col("uni"), 6).as("jac"))
    assert(pruned.exceptAll(brute).isEmpty &&
      brute.exceptAll(pruned).isEmpty,
      "prefix filtering must lose no qualifying pair")
    // and the planted near-dups make the check non-vacuous
    assert(pruned.count() > 0)
  }
}
