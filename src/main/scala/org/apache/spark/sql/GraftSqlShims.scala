package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset constructor so library code can
  * materialize a DataFrame from a custom [[LogicalPlan]] node (the same
  * technique Delta/Frameless use to plug plan-level operators into the
  * public API surface).
  */
object GraftSqlShims {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
