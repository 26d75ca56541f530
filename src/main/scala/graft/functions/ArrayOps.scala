package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{ColumnBridge, LongArrayDot}

/** Column-level entry points for the custom Catalyst expressions (the
  * expressions themselves live in the sql shim package because Catalyst's
  * ExpectsInputTypes surface is private[sql]).
  */
object ArrayOps {
  /** Codegen'd dot product of two array<long> columns ([[LongArrayDot]]). */
  def longArrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
