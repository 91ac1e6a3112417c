package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset

/** The one `private[sql]` door a library-level custom operator needs:
  * turning a hand-built LogicalPlan into a DataFrame. Lives under
  * `org.apache.spark.sql` for access, nothing else — the standard pattern
  * for third-party Spark extensions that add logical operators. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
