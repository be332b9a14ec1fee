package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-4/5 curation + maintenance operators:
  * SemDeDup cluster-prune (q147), boilerplate detection (q148),
  * target-mixture reweighting (q149), DSIR importance weights (q150),
  * incremental aggregate maintenance (q151), SCD2 snapshot history
  * (q152) and OOV-rate vocab coverage (q153). The DuckDB oracle checks
  * exact values; these pin the semantic invariants that keep the
  * operators correct at any scale.
  */
class Wave4Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q147 SemDeDup: keeper precedes every dropped vector, drops are unique") {
    val rows = VectorOps.queries("q147_semdedup")(spark, sf)
      .select("vec_id", "keeper_id", "cos_max").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(0), "keeper must have the lower id")
      assert(r.getDouble(2) >= 0.3, "pruned pair must clear the threshold")
    }
    // one verdict per dropped vector — the keep-set is well-defined
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q148 boilerplate: ratio bounded, boiler occurrences never exceed total") {
    val rows = TextOps.queries("q148_boilerplate")(spark, sf)
      .select("n_sh", "n_boiler", "ratio_ppm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
    }
  }

  test("q149 mixture reweighting: rates capped at 1, over-represented lang downsampled") {
    val rows = TextOps.queries("q149_mixture_reweight")(spark, sf).collect()
    val byLang = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(byLang.values.forall(_._2 <= 1000000L))
    // en holds >20% of tokens against a 20% target => rate strictly < 1
    // and the kept token count respects the rate direction
    val (enTok, enRate, enKept) = byLang("en")
    assert(enRate < 1000000L)
    assert(enKept <= enTok)
    // under-represented langs keep everything (rate caps at 1e6)
    assert(byLang.exists { case (l, (_, r, _)) => l != "en" && r == 1000000L })
  }

  test("q151 incremental merge equals one-shot aggregate") {
    val merged = TextOps.queries("q151_incremental_agg")(spark, sf)
    val full = graft.Tables.table(spark, sf, "documents")
      .select(col("source"),
        size(filter(split(lower(col("text")), " "), w => w =!= ""))
          .cast("long").as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("tokens"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("q152 SCD2: one open row per live doc, changed docs close v1 and open v2") {
    val h = AnalyticsOps.queries("q152_scd2_history")(spark, sf)
      .persist()
    // every doc has exactly one current row unless it was deleted
    val perDoc = h.groupBy("doc_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"),
        count(lit(1)).as("n_rows"))
    assert(perDoc.filter(col("n_cur") > 1).count() == 0)
    assert(perDoc.filter(col("n_rows") > 2).count() == 0)
    // a closed row is never current; an open row has no valid_to
    assert(h.filter(col("valid_to").isNotNull && col("is_current"))
      .count() == 0)
    assert(h.filter(col("valid_to").isNull && !col("is_current"))
      .count() == 0)
    // changed docs: v1 closed at 2, v2 current from 2
    val changed = h.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") === 2)
    val v2 = h.join(changed, "doc_id").filter(col("valid_from") === 2)
    assert(v2.count() == changed.count())
    assert(v2.filter(!col("is_current")).count() == 0)
    h.unpersist()
  }

  test("q153 OOV rate is bounded and exact at the boundaries") {
    val rows = TextOps.queries("q153_oov_rate")(spark, sf)
      .select("n_toks", "n_oov", "oov_ppm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      val ppm = r.getLong(2)
      assert(ppm >= 0L && ppm <= 1000000L)
      if (r.getLong(1) == 0L) assert(ppm == 0L)
      if (r.getLong(1) == r.getLong(0)) assert(ppm == 1000000L)
    }
  }

  test("q154 out-of-order audit matches a per-user replay") {
    val got = AuditOps.queries("q154_out_of_order")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val byUser = graft.Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    byUser.foreach { case (u, evs) =>
      var mx = Long.MinValue; var late = 0L; var worst = 0L
      evs.sortBy(_._2).foreach { case (_, _, t) =>
        if (mx != Long.MinValue && t < mx) {
          late += 1; worst = math.max(worst, mx - t)
        }
        mx = math.max(mx, t)
      }
      assert(got(u) == ((evs.length.toLong, late, worst)),
        s"user $u: got ${got(u)}, replay ${(evs.length, late, worst)}")
    }
  }

  test("q155 k-anonymity partitions the customer table exactly") {
    val rows = AuditOps.queries("q155_k_anonymity")(spark, sf).collect()
    val total = graft.Tables.table(spark, sf, "customer").count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach(r => assert(r.getBoolean(3) == (r.getLong(2) >= 50L)))
  }

  test("q150 DSIR: target-slice documents outscore the rest on average") {
    val w = TextOps.queries("q150_dsir_weights")(spark, sf)
    val docs = graft.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"))
    val avg2 = w.join(docs, "doc_id")
      .withColumn("is_tgt",
        col("source").isin("src0", "src1", "src2", "src3"))
      .groupBy("is_tgt")
      .agg(avg(col("weight_micro").cast("double") / col("n_toks"))
        .as("avg_w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg2(true) > avg2(false),
      s"target avg ${avg2(true)} must exceed raw avg ${avg2(false)}")
  }
}
