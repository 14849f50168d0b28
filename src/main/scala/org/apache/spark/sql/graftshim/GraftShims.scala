package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * Spark 4's public `Column` wraps a `ColumnNode`; the conversion helpers
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`,
  * so custom-Expression libraries expose them through a shim placed in an
  * `org.apache.spark.sql` subpackage — the standard pattern for Catalyst
  * extensions on Spark 4.
  */
object GraftShims {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the session's CacheManager holds no cached plans —
    * `sharedState`/`CacheManager` are `private[sql]`, so the
    * cache-discipline spec reads them through this shim.
    */
  def cacheManagerIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
