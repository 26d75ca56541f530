package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{FunctionRegistryBridge, LongArrayDot}

/** SparkSessionExtensions hook registering graft's custom Catalyst
  * expressions as SQL functions, so pure-SQL users (spark.sql, JDBC)
  * reach them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * then `SELECT long_array_dot(a, b) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.longArrayDotFn)
}

object GraftExtensions {
  private val longArrayDotFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("long_array_dot"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
    (args: Seq[Expression]) => {
      require(args.size == 2,
        s"long_array_dot expects 2 arguments, got ${args.size}")
      LongArrayDot(args.head, args(1))
    })

  /** Install the same functions into an already-built session (builder
    * extensions only apply at construction time; the driver hands graft a
    * pre-built session). Idempotent: re-registration replaces the entry.
    */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = longArrayDotFn
    FunctionRegistryBridge.register(spark, id, info, builder)
  }
}
