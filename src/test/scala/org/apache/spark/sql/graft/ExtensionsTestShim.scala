package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only accessor for the `private[sql]` extension builders. */
object ExtensionsTestShim {
  def optimizerRules(e: SparkSessionExtensions,
                     s: SparkSession): Seq[Rule[LogicalPlan]] =
    e.buildOptimizerRules(s)
}
