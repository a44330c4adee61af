package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** All `tables` sign-LSH bucket ids of a milli-quantized vector in ONE
  * codegen'd expression: bucket `t` has bit `j` set iff
  * `<v, p_{t*planes+j}> >= 0` over the repo's shared deterministic
  * integer hyperplane family
  * `p_j[d] = ((2654435761·(d+1)·(j+1) + 40503·(j+1)) mod 2001) − 1000`
  * (one source of truth: graft.sim.CosineSim.planeVector — the weight
  * matrix here is BUILT from the same closed form and pinned equal by
  * CosineSimSpec).
  *
  * Why not `tables × planes` LongArrayDot(lit(plane), q) columns (the
  * previous shape): each plane literal embeds a dim-length array in
  * the plan, so a 6-table × 6-plane hashing pass carried 36 such
  * literals (~72 KB of explain output) through analysis, optimization
  * and canonicalization ON EVERY QUERY CONSTRUCTION, and evaluation
  * dispatched 36 separate expression trees per row. This expression is
  * ONE plan node; the weight matrix is computed once per (dim) and
  * cached on the expression instance, and evaluation is a single
  * nested primitive loop. It also removes the driver-side
  * `select(size(vec)).head` dim-probe job the literal form needed —
  * the dimension falls out of each row's own array length.
  *
  * Cost note: the weight cache is keyed by the FIRST dim seen (vectors
  * in one column share a dimension in every registered pipeline; a
  * mixed-dim column would recompute per row for the minority dim —
  * correct, just slower).
  */
case class SignBucketsExpr(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(planes >= 1 && planes <= 63, s"planes=$planes outside [1, 63]")
  require(tables >= 1, s"tables=$tables must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // single-slot cache of ONE immutable (dim, weights) pair behind a
  // volatile reference: readers see either null or a fully built pair
  // (safe publication), so a shared instance evaluating concurrently
  // can never pair a stale matrix with a matching dim — worst case is
  // a redundant recompute, never a wrong bucket
  @volatile @transient private[this] var cachedRef: (Int, Array[Array[Long]]) = _

  private def weightsFor(dim: Int): Array[Array[Long]] = {
    val c = cachedRef
    if (c != null && c._1 == dim) c._2
    else {
      val w = Array.tabulate(tables * planes, dim) { (j, d) =>
        ((2654435761L * (d + 1) * (j + 1) + 40503L * (j + 1)) % 2001L) - 1000L
      }
      cachedRef = (dim, w)
      w
    }
  }

  /** Called from both interpreted eval and generated code. */
  def buckets(input: ArrayData): ArrayData = {
    val dim = input.numElements()
    val w = weightsFor(dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var jp = 0
      while (jp < planes) {
        val row = w(t * planes + jp)
        var dot = 0L
        var d = 0
        while (d < dim) { dot += input.getLong(d) * row(d); d += 1 }
        if (dot >= 0) b |= 1L << jp
        jp += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    buckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBuckets", this,
      classOf[SignBucketsExpr].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.buckets($a);\n")
  }

  override protected def withNewChildInternal(newChild: Expression): SignBucketsExpr =
    copy(child = newChild)
}

object SignBucketsExpr {
  def column(a: Column, planes: Int, tables: Int): Column =
    ExpressionUtils.column(
      SignBucketsExpr(ExpressionUtils.expression(a), planes, tables))
}
