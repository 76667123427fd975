package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** `Dataset.ofRows` is `private[sql]`; graft's custom logical operators
  * (e.g. [[graft.plans.AsofJoin]]) need exactly one entry point that
  * wraps a hand-built plan into a DataFrame. This bridge lives inside
  * the `org.apache.spark.sql` package namespace to access it — the same
  * technique every Spark extension library uses (no Spark internals are
  * modified, only the published private[sql] constructor is called).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
