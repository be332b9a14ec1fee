package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase distributed neighbor scan must compute exactly what the
  * naive single-task global window computes, for any partition count —
  * including partitions with no carrier rows at all (the carry must hop
  * over them) and carriers at partition boundaries.
  */
class OrderedScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.shuffle.partitions", "7")
    s
  }

  override def afterAll(): Unit = graft.SparkTestSession.cleanup()

  /** 400 rows, ~1/7 carriers (t == 0), duplicate x values so the
    * (x, t, uid) tie-break is exercised, long carrier-free stretches so
    * cross-partition carries hop gaps. */
  private def frame() = spark.range(400).select(
    col("id").as("uid"),
    (col("id") * 37 % 23).as("x"),
    when(col("id") % 7 === 0, lit(0L)).otherwise(1L).as("t"),
    (col("id") * 13 % 101).as("y"))

  test("neighborScan == the naive global window, struct carrier") {
    val u = frame()
    val carrier = when(col("t") === 0,
      struct(col("x").as("cx"), col("y").as("cy")))
    val got = OrderedScan
      .neighborScan(u, Seq("x", "t", "uid"), carrier, "_b", "_f")
      .select(col("uid"), col("_b.cx").as("bx"), col("_b.cy").as("by"),
        col("_f.cx").as("fx"), col("_f.cy").as("fy"))
    val ord = Window.orderBy("x", "t", "uid")
    val bw = ord.rowsBetween(Window.unboundedPreceding, 0)
    val fw = ord.rowsBetween(1, Window.unboundedFollowing)
    val want = u
      .withColumn("bx", last(when(col("t") === 0, col("x")),
        ignoreNulls = true).over(bw))
      .withColumn("by", last(when(col("t") === 0, col("y")),
        ignoreNulls = true).over(bw))
      .withColumn("fx", first(when(col("t") === 0, col("x")),
        ignoreNulls = true).over(fw))
      .withColumn("fy", first(when(col("t") === 0, col("y")),
        ignoreNulls = true).over(fw))
      .select("uid", "bx", "by", "fx", "fy")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("result is invariant under the input's physical partitioning") {
    val carrier = when(col("t") === 0, col("y"))
    def run(parts: Int) = OrderedScan
      .neighborScan(frame().repartition(parts), Seq("x", "t", "uid"),
        carrier, "b", "f")
      .select("uid", "b", "f")
    val a = run(1)
    val b = run(13)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("caller columns named like the internals survive untouched") {
    // Every internal working name in use: withColumn on any of these
    // used to silently replace (then drop) the caller's column.
    val u = frame()
      .withColumn("_c", col("y") + 1)
      .withColumn("_pid", col("y") + 2)
      .withColumn("_lb", col("y") + 3)
      .withColumn("_lf", col("y") + 4)
      .withColumn("_cb", col("y") + 5)
      .withColumn("_cf", col("y") + 6)
    val out = OrderedScan.neighborScan(u, Seq("x", "t", "uid"),
      when(col("t") === 0, col("y")), "b", "f")
    assert(Seq("_c", "_pid", "_lb", "_lf", "_cb", "_cf")
      .forall(out.columns.contains))
    assert(out.filter(col("_c") =!= col("y") + 1 ||
      col("_cf") =!= col("y") + 6).isEmpty)
    // and the scan itself still computes the right neighbors
    val plain = OrderedScan.neighborScan(frame(), Seq("x", "t", "uid"),
      when(col("t") === 0, col("y")), "b", "f").select("uid", "b", "f")
    val got = out.select("uid", "b", "f")
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }

  test("exchange reuse disabled -> checkpoint fallback, same result") {
    val carrier = when(col("t") === 0, col("y"))
    val want = OrderedScan.neighborScan(frame(), Seq("x", "t", "uid"),
      carrier, "b", "f").select("uid", "b", "f").collect().toSet
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val got = OrderedScan.neighborScan(frame(), Seq("x", "t", "uid"),
        carrier, "b", "f").select("uid", "b", "f").collect().toSet
      assert(got == want)
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("no carriers at all -> all-null neighbors; all carriers -> dense") {
    val none = OrderedScan.neighborScan(frame(),
      Seq("x", "t", "uid"), when(col("t") === 99, col("y")), "b", "f")
    assert(none.filter(col("b").isNotNull || col("f").isNotNull)
      .isEmpty)
    val all = OrderedScan.neighborScan(frame(),
      Seq("x", "t", "uid"), col("y"), "b", "f")
    // every row carries, so only the global last row lacks a forward
    // neighbor and none lacks a backward one (itself counts).
    assert(all.filter(col("b").isNull).isEmpty)
    assert(all.filter(col("f").isNull).count() == 1)
  }
}
