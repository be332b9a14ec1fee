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
}
