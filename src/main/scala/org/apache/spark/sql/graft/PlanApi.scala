package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway the engine's custom logical plans
  * need: wrap a hand-built [[LogicalPlan]] into a [[DataFrame]] so it
  * flows through the ordinary analyze → optimize → plan pipeline
  * (where `GraftExtensions`' injected strategy picks it up). Lives in
  * `org.apache.spark.sql` for access to `Dataset.ofRows` — the same
  * move every Spark-native plan library makes; no Spark internals are
  * modified.
  */
object PlanApi {
  def ofRows(plan: LogicalPlan, spark: org.apache.spark.sql.SparkSession): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Release the cached blocks behind a `localCheckpoint(true)`-ed
    * frame. `Dataset.unpersist` only drains CacheManager entries
    * registered via `persist`, so superseded checkpoint rounds in an
    * iterative loop otherwise linger at MEMORY_AND_DISK until the
    * ContextCleaner happens to GC them — a long session running many
    * convergence loops accumulates dead blocks. The checkpointed
    * frame's analyzed plan is a [[org.apache.spark.sql.execution.LogicalRDD]]
    * leaf over the materialized RDD; unpersisting that RDD frees the
    * blocks immediately. Safe ONLY for frames that will never be read
    * again (a locally-checkpointed RDD cannot recompute lost
    * partitions). No-op for non-checkpointed plans.
    */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
