/* Lives in org.apache.spark.sql.* solely to reach the private[sql]
 * Expression ⇄ Column converters — the standard extension-library
 * pattern for registering custom Catalyst expressions without a fork. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register graft's SQL functions on an already-running session
    * (the extensions config path only applies at session build). */
  def registerGraftFunctions(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.plans.GraftFunctions.all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
