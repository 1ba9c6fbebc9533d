package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the engine needs: turning a custom
  * [[LogicalPlan]] node into a user-facing [[DataFrame]]
  * (`Dataset.ofRows` — the same call every DataFrame operator uses
  * internally). Spark exposes extension points for injecting rules,
  * strategies and functions but not for *constructing* a plan node
  * directly, so whole-operator extensions (graft.plans.AsOfJoin)
  * conventionally ship this one-liner in the `org.apache.spark.sql`
  * package — the approach used by the major open-source plan-level
  * extensions. Nothing else in the engine reaches into private API.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
