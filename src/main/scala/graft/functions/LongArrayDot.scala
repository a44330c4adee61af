package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Exact int64 dot product of two `array<long>` columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions
  * are interpreted per element and `zip_with` allocates an intermediate
  * array per row — on an all-pairs similarity join that is millions of
  * allocations and lambda dispatches in the hot loop. This expression
  * compiles to a tight primitive `for` loop inside the generated stage.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]`; the public API is
  * `graft.functions.LongArrayDot`.
  *
  * Semantics: element-wise multiply-accumulate over the common prefix
  * of the two arrays; NULL if either side is NULL (null-intolerant,
  * like the built-in arithmetic it replaces). Callers guarantee
  * overflow-safety by quantization bounds (see graft.sim.CosineSim).
  */
case class LongArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $acc = 0L;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDotExpr =
    copy(left = newLeft, right = newRight)
}

object LongArrayDotExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(LongArrayDotExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
