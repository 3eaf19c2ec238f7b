package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/**
 * The one `private[sql]` bridge the engine needs: build a `DataFrame`
 * from a library-defined `LogicalPlan` (`Dataset.ofRows` is sql-private
 * in Spark 4). Lives under `org.apache.spark.sql` for access; contains
 * no logic.
 */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
