package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 wraps columns in `ColumnNode`s and keeps the
  * Expression constructors `private[sql]`; this one-file shim (in an
  * `org.apache.spark.sql` subpackage, the standard extension-library
  * pattern) is the only place that touches the internal API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a live session's function registry
    * (the post-build counterpart of SparkSessionExtensions.injectFunction,
    * for sessions we don't construct — e.g. the driver's). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
