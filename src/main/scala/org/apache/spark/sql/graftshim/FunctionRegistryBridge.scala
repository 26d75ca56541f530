package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into the `private[sql]` session function registry so graft's
  * SQL functions can be installed into an ALREADY BUILT session (the
  * driver's Verify/Bench sessions are constructed without
  * `withExtensions`; `SparkSessionExtensions` only applies at build
  * time). Same registration surface `injectFunction` uses underneath.
  */
object FunctionRegistryBridge {
  def register(spark: SparkSession, name: FunctionIdentifier,
               info: ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
