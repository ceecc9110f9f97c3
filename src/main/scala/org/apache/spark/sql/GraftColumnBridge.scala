package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> catalyst Expression
  * converters, for graft's native expressions (e.g.
  * `graft.plans.CosineSim`). This is the standard third-party
  * extension seam in Spark 4's split Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression under a SQL function name on a
    * LIVE session (the function-registry seam `SparkSessionExtensions
    * .injectFunction` uses, reachable post-build — extensions only
    * apply when a session is first constructed).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
