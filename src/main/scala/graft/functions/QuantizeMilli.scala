package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Milli-unit fixed-point quantization of a float/double array:
  * `round(x * 1000) : BIGINT` per element, as ONE codegen'd loop.
  *
  * Why not `transform(vec, x -> round(x * 1000).cast("long"))`: Spark's
  * higher-order functions evaluate the lambda interpreted, per element,
  * with a `GenericArrayData` allocation per row — this runs on every
  * corpus row of every similarity operator, so it is hot. The semantics
  * match the built-in chain exactly: `cast(x as double)`, multiply,
  * HALF_UP round (Spark's `round` on double), cast to long.
  *
  * Input elements are non-nullable in practice (embedding vectors);
  * a null element quantizes to 0 rather than forcing a nullable
  * output array (documented deviation — similarity math treats missing
  * dimensions as zero contribution).
  */
case class QuantizeMilliExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = java.math.BigDecimal.valueOf(arr.getDouble(i) * 1000d)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = java.math.BigDecimal.valueOf($a.getDouble($i) * 1000d)
         |      .setScale(0, java.math.RoundingMode.HALF_UP).longValue();
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeMilliExpr =
    copy(child = newChild)
}

object QuantizeMilliExpr {
  def column(a: Column): Column =
    ExpressionUtils.column(QuantizeMilliExpr(ExpressionUtils.expression(a)))
}
