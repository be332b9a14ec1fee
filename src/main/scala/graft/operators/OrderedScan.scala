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
    // Internal working columns take collision-free names: withColumn on
    // a name the caller already uses would silently REPLACE the caller's
    // column (and the final drop would delete it) instead of failing.
    def fresh(base: String): String = Iterator.iterate(base)(_ + "_")
      .dropWhile(n => df.columns.contains(n) || n == bwOut || n == fwOut)
      .next()
    val (cN, pidN, lbN, lfN, cbN, cfN) = (fresh("_c"), fresh("_pid"),
      fresh("_lb"), fresh("_lf"), fresh("_cb"), fresh("_cf"))
    val oc = orderCols.map(col)
    val ranged = df
      .withColumn(cN, carrier)
      .repartitionByRange(oc: _*)
      .sortWithinPartitions(oc: _*)
      .withColumn(pidN, spark_partition_id())
    val w = Window.partitionBy(pidN).orderBy(oc: _*)
    val bw = w.rowsBetween(Window.unboundedPreceding, 0)
    val fw = w.rowsBetween(1, Window.unboundedFollowing)
    val local0 = ranged
      .withColumn(lbN, last(col(cN), ignoreNulls = true).over(bw))
      .withColumn(lfN, first(col(cN), ignoreNulls = true).over(fw))
    // Phase-2 correctness needs the summary subtree and the final join
    // to observe ONE pid assignment. The range exchange appears in both
    // subtrees; under the default exchange reuse (spark.sql.exchange
    // .reuse; AQE's stage reuse likewise) it is planned and executed
    // once, which pins the sampled range boundaries and hence every
    // row's pid. A session that disables reuse would re-sample the
    // boundaries per subtree and could assign pids divergently — pin
    // the materialization explicitly with a localCheckpoint there.
    val reuseOn = df.sparkSession.conf
      .get("spark.sql.exchange.reuse", "true").toBoolean
    val local = if (reuseOn) local0 else local0.localCheckpoint()
    // Per-partition extremes among carrier rows: order cols lead the
    // struct so lexicographic max/min = last/first in partition order.
    val keyed = when(col(cN).isNotNull,
      struct(oc :+ col(cN).as(cN): _*))
    val summary = local.groupBy(pidN)
      .agg(max(keyed).as("_mx"), min(keyed).as("_mn"))
    // Carry-ins from a P² self-join (P = shuffle partition count): the
    // backward carry of partition i is the latest carrier of any
    // partition j < i; forward symmetric. Empty/carrier-free partitions
    // contribute nulls, which max/min ignore.
    val carryB = summary.as("s")
      .join(summary.as("p"), col(s"p.$pidN") < col(s"s.$pidN"))
      .groupBy(col(s"s.$pidN").as(pidN))
      .agg(max(col("p._mx")).as(cbN))
    val carryF = summary.as("s")
      .join(summary.as("p"), col(s"p.$pidN") > col(s"s.$pidN"))
      .groupBy(col(s"s.$pidN").as(pidN))
      .agg(min(col("p._mn")).as(cfN))
    local
      .join(broadcast(carryB), Seq(pidN), "left_outer")
      .join(broadcast(carryF), Seq(pidN), "left_outer")
      .withColumn(bwOut, coalesce(col(lbN), col(cbN).getField(cN)))
      .withColumn(fwOut, coalesce(col(lfN), col(cfN).getField(cN)))
      .drop(cN, pidN, lbN, lfN, cbN, cfN)
  }
}
