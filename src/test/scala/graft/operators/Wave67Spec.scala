package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the wave-67 recommender baseline and reconciliation
  * audit (q321–q322); the DuckDB oracle separately hash-checks exact
  * values at the gate SFs.
  */
class Wave67Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = graft.SparkTestSession.spark

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  test("q321 matches a sequential alternating-means recompute") {
    val rows = graft.Tables.table(spark, sf, "lineitem")
      .join(graft.Tables.table(spark, sf, "orders"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("o_custkey", "l_partkey",
        "CAST(floor(l_quantity) AS BIGINT)",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val t0 = rows.map(_._4).min; val t1 = rows.map(_._4).max
    val cut = t0 + (t1 - t0) * 4 / 5
    val train = rows.filter(_._4 < cut)
    val test = rows.filter(_._4 >= cut)
    val mu = train.map(_._3).sum / train.size
    val bi = train.groupBy(_._2).map { case (i, g) =>
      i -> g.map(_._3 - mu).sum / g.size
    }
    val bu = train.groupBy(_._1).map { case (u, g) =>
      u -> g.map(t => t._3 - mu - bi(t._2)).sum / g.size
    }
    val preds = test.map { t =>
      val p = math.max(1L, math.min(50L,
        mu + bi.getOrElse(t._2, 0L) + bu.getOrElse(t._1, 0L)))
      (math.abs(t._3 - p), bi.contains(t._2), bu.contains(t._1))
    }
    val expected = (train.size.toLong, test.size.toLong, mu,
      preds.map(_._1).sum * 1000000L / test.size,
      preds.count(!_._2).toLong, preds.count(!_._3).toLong)
    val got = graft.SparkEntry
      .queries("q321_bias_recommender_mae")(spark, sf).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4), got.getLong(5)) == expected)
  }

  test("q322 buckets cover all orders and shares sum to ~1e6") {
    val got = graft.SparkEntry
      .queries("q322_reconciliation_histogram")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nOrders = graft.Tables.table(spark, sf, "orders").count()
    assert(got.map(_._2).sum == nOrders)
    val shares = got.map(_._5).sum
    assert(shares > 999990L && shares <= 1000000L)
    // Bucket bounds hold: every bucket's min/max err lie in its range.
    got.foreach { case (b, _, mn, mx, _) =>
      assert(mn <= mx)
      if (b > -10 && b < 10) {
        assert(mn / 100000 == b || (mn < 0 && mn / 100000 == b))
        assert(mx / 100000 == b || (mx < 0 && mx / 100000 == b))
      }
    }
  }
}
