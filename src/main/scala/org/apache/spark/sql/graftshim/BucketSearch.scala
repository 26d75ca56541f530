package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** Native Catalyst expression: the bucket id of a double under a
  * plan-time-constant sorted boundary list — `count of boundaries
  * passed`, where boundary i is passed when `v >= values(i)` (if
  * `atValue(i)`) or `v > values(i)` (otherwise). The pass predicate is
  * monotone along the sorted boundaries, so a binary search computes
  * the count in `log2(n)` comparisons.
  *
  * This is the per-row hot path of the equi-depth bucketing core
  * (`graft.operators.ValueBucketing`): a nested-`when` tree expresses
  * the same search declaratively, but at the default 256 buckets its
  * generated method is hundreds of branches — past HotSpot's huge-
  * method JIT threshold, so the whole stage runs interpreted and the
  * scan slows ~7x (measured 50M rows: 71 s vs 10 s). This expression
  * stays a constant ~15 lines of generated code regardless of the
  * boundary count, with an equivalent interpreted `nullSafeEval` for
  * non-codegen paths. The boundary arrays ride the plan as reference
  * objects (broadcast with the serialized plan, never per row).
  */
case class BucketSearch(child: Expression,
                        values: Array[Double],
                        atValue: Array[Boolean])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(values.length == atValue.length,
    "values and atValue must be parallel arrays")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_search"

  // Case-class equality on Array fields is REFERENCE equality, which
  // would make two semantically identical instances never
  // `semanticEquals` — canonicalization / common-subexpression
  // elimination could not dedupe them (round-10 ADVICE). Compare and
  // hash by CONTENT instead; the arrays stay arrays for the per-row
  // eval hot path.
  override def equals(other: Any): Boolean = other match {
    case b: BucketSearch =>
      child == b.child && java.util.Arrays.equals(values, b.values) &&
        java.util.Arrays.equals(atValue, b.atValue)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child,
    Integer.valueOf(java.util.Arrays.hashCode(values)),
    Integer.valueOf(java.util.Arrays.hashCode(atValue)))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    var lo = 0
    var hi = values.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val passed =
        if (atValue(mid)) v >= values(mid) else v > values(mid)
      if (passed) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val vals = ctx.addReferenceObj("bucketVals", values, "double[]")
    val flags = ctx.addReferenceObj("bucketAtValue", atValue, "boolean[]")
    nullSafeCodeGen(ctx, ev, v => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val passed = ctx.freshName("passed")
      s"""
         |int $lo = 0;
         |int $hi = $vals.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  boolean $passed = $flags[$mid]
         |    ? ($v >= $vals[$mid]) : ($v > $vals[$mid]);
         |  if ($passed) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BucketSearch = copy(child = newChild)
}
