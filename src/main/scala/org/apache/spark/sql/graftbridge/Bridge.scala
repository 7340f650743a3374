package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]`; extension libraries reach them by living under the
  * `org.apache.spark.sql` package namespace (the same pattern public
  * Spark connector/extension projects use). */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)

  /** Register a function builder on an EXISTING session (the
    * `SparkSessionExtensions.injectFunction` path only applies at
    * session build time; a library also wants to light up SQL names on
    * a session it's handed). Same `private[sql]` boundary as the
    * Column bridge above. */
  def registerFunction(spark: org.apache.spark.sql.classic.SparkSession,
                       name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
