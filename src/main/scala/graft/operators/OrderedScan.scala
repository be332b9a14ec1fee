package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order neighbor scans — the two-phase
  * range-partitioned generalization of [[TextOps.orderedCumsum]] /
  * `AnalyticsOps.strictPrefixMaxDesc` to arbitrary non-null "carrier"
  * payloads. The round-7 sf1 scale-up measured the naive form of this
  * shape — ONE `Window.orderBy` over the whole frame — at 24.4× for 10×
  * data (q342: every row funnels through a single task); this helper is
  * the replacement used wherever a query needs "nearest non-null row
  * before/after me in a global sort order".
  *
  * Phase 1: `repartitionByRange(orderCols)` spreads the frame across
  * range-contiguous partitions; a PER-PARTITION window (partitionBy the
  * partition id) computes the local backward last-non-null and forward
  * first-non-null carrier — n/P rows per task at any corpus size.
  * Phase 2: a P-row per-partition summary (last/first non-null carrier
  * of each partition) is self-joined (P² pairs, trivially small) to
  * derive each partition's cross-partition carry-in from EARLIER
  * (backward) / LATER (forward) partitions, broadcast back, and
  * coalesced under the local result. No single-partition exchange over
  * the data frame at any stage; correctness is independent of the
  * sampled range boundaries (any split yields the same coalesce).
  */
object OrderedScan {

  /** Adds `bwOut` = last non-null `carrier` over the inclusive prefix
    * and `fwOut` = first non-null `carrier` over the strict suffix of
    * the global (orderCols)-order, distributed as described above.
    * `orderCols` must be a total order (unique per row); `carrier` is
    * any expression that is null on rows that do not "emit" a neighbor
    * value (e.g. `when(col("t") === 0, struct(x, y))` for control-row
    * payloads).
    */
  def neighborScan(df: DataFrame, orderCols: Seq[String], carrier: Column,
      bwOut: String, fwOut: String): DataFrame = {
    val oc = orderCols.map(col)
    val ranged = df
      .withColumn("_c", carrier)
      .repartitionByRange(oc: _*)
      .sortWithinPartitions(oc: _*)
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy("_pid").orderBy(oc: _*)
    val bw = w.rowsBetween(Window.unboundedPreceding, 0)
    val fw = w.rowsBetween(1, Window.unboundedFollowing)
    val local = ranged
      .withColumn("_lb", last(col("_c"), ignoreNulls = true).over(bw))
      .withColumn("_lf", first(col("_c"), ignoreNulls = true).over(fw))
    // Per-partition extremes among carrier rows: order cols lead the
    // struct so lexicographic max/min = last/first in partition order.
    val keyed = when(col("_c").isNotNull,
      struct(oc :+ col("_c").as("_c"): _*))
    val summary = local.groupBy("_pid")
      .agg(max(keyed).as("_mx"), min(keyed).as("_mn"))
    // Carry-ins from a P² self-join (P = shuffle partition count): the
    // backward carry of partition i is the latest carrier of any
    // partition j < i; forward symmetric. Empty/carrier-free partitions
    // contribute nulls, which max/min ignore.
    val carryB = summary.as("s")
      .join(summary.as("p"), col("p._pid") < col("s._pid"))
      .groupBy(col("s._pid").as("_pid"))
      .agg(max(col("p._mx")).as("_cb"))
    val carryF = summary.as("s")
      .join(summary.as("p"), col("p._pid") > col("s._pid"))
      .groupBy(col("s._pid").as("_pid"))
      .agg(min(col("p._mn")).as("_cf"))
    local
      .join(broadcast(carryB), Seq("_pid"), "left_outer")
      .join(broadcast(carryF), Seq("_pid"), "left_outer")
      .withColumn(bwOut, coalesce(col("_lb"), col("_cb._c")))
      .withColumn(fwOut, coalesce(col("_lf"), col("_cf._c")))
      .drop("_c", "_pid", "_lb", "_lf", "_cb", "_cf")
  }
}
