package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType}

/** Scalar (int8) quantization of an already milli-quantized
  * `array<long>` vector — the IVF list-compression kernel
  * ([[graft.sim.IvfIndex]]): per-vector symmetric codes
  * `code_i = round(v_i * 127 / maxabs)` packed as BINARY (1 byte/dim
  * instead of 8), with `maxabs` stored alongside so the approximate
  * value reconstructs as `code_i * maxabs / 127`. The codes rank
  * candidates; the exact top set re-ranks from raw vectors — so the
  * quantization error bounds RECALL of the candidate cut, never the
  * served scores. Codegen'd tight loops, same rationale as
  * [[LongArrayDotExpr]].
  */
case class Int8EncodeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0L
    var i = 0
    while (i < n) {
      val v = x.getLong(i); val av = if (v < 0) -v else v
      if (av > mx) mx = av
      i += 1
    }
    val out = new Array[Byte](n)
    if (mx > 0L) {
      i = 0
      while (i < n) {
        out(i) = Math.round(x.getLong(i) * 127.0 / mx).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val mx = ctx.freshName("mx"); val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |long $mx = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i); if ($v < 0) $v = -$v;
         |  if ($v > $mx) $mx = $v;
         |}
         |final byte[] $out = new byte[$n];
         |if ($mx > 0L) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.round($a.getLong($i) * 127.0 / $mx);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Int8EncodeExpr =
    copy(child = c)
}

/** `max(|v_i|)` of an `array<long>` — the int8 scale companion of
  * [[Int8EncodeExpr]] (stored per vector to reconstruct magnitudes).
  */
case class LongArrayMaxAbsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var mx = 0L
    var i = 0
    while (i < x.numElements()) {
      val v = x.getLong(i); val av = if (v < 0) -v else v
      if (av > mx) mx = av
      i += 1
    }
    mx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val mx = ctx.freshName("mx")
      val v = ctx.freshName("v")
      s"""
         |long $mx = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $v = $a.getLong($i); if ($v < 0) $v = -$v;
         |  if ($v > $mx) $mx = $v;
         |}
         |${ev.value} = $mx;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): LongArrayMaxAbsExpr =
    copy(child = c)
}

/** Exact int64 dot of a full-precision `array<long>` query against
  * int8 codes (`binary`) — the approximate-scoring hot loop of the
  * quantized IVF lists: `Σ q_i · code_i`, scaled by the candidate's
  * stored `maxabs/127` outside. Common-prefix semantics and null
  * intolerance match [[LongArrayDotExpr]].
  */
case class LongArrayByteDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), BinaryType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.numElements(), y.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $acc = 0L;
         |final int $n = java.lang.Math.min($a.numElements(), $b.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * (long) $b[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayByteDotExpr =
    copy(left = newLeft, right = newRight)
}

object Int8EncodeExpr {
  def column(a: Column): Column =
    ExpressionUtils.column(Int8EncodeExpr(ExpressionUtils.expression(a)))
  def maxAbs(a: Column): Column =
    ExpressionUtils.column(LongArrayMaxAbsExpr(ExpressionUtils.expression(a)))
  def byteDot(q: Column, code: Column): Column =
    ExpressionUtils.column(LongArrayByteDotExpr(
      ExpressionUtils.expression(q), ExpressionUtils.expression(code)))
}
