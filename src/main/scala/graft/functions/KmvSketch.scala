package org.apache.spark.sql.graftexpr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** KMV (k-minimum-values, "bottom-k" Theta) distinct sketch.
  *
  * Spark ships HLL-family sketches (`approx_count_distinct`,
  * `hll_sketch_agg`) which support UNION only. KMV additionally
  * supports INTERSECTION estimates — the operation overlap analytics
  * at corpus scale actually needs ("how many fingerprints do source A
  * and source B share?") — because the sketch retains an actual uniform
  * sample of the hashed universe: the k smallest 60-bit hashes.
  *
  * Contract: the input column is a 60-bit hash (LongType in
  * `[0, 2^60)`), e.g. `graft.dedup.Shingles.baseHash`. Keeping the hash
  * caller-supplied keeps every estimate deterministic and replayable in
  * ANSI SQL — the DuckDB oracle recomputes identical sketches, so even
  * the *approximate* estimates hash-match across engines.
  *
  * Estimators (standard KMV, Beyer et al. 2007):
  *  - distinct:  n < k → n exact;  else (k-1) / θ,  θ = hₖ / 2^60
  *  - intersect: θ = min(θ_A, θ_B); D = |{h ∈ A∩B sketches : h < θ·2^60}|;
  *               estimate = D / θ
  *
  * Scale shape: a [[TypedImperativeAggregate]] — per-group state is a
  * bounded sorted set (≤ k longs ≈ 8k bytes), map-side partials merge
  * associatively, the shuffle carries one ≤(8k+8)-byte blob per group
  * regardless of input cardinality.
  *
  * Serialized form (also the `eval` output, BinaryType):
  * int32 k | int32 n | n × int64 ascending distinct hashes.
  */
object KmvSketch {

  val HashBits = 60
  val HashSpace: Double = math.pow(2.0, HashBits)

  /** Mutable bounded buffer: the k smallest distinct hashes. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
    def add(h: Long): Unit = {
      if (set.size < k) set.add(h)
      else if (h < set.last()) { if (set.add(h)) set.pollLast() }
    }
    def merge(other: Buffer): Buffer = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
      this
    }
  }

  def serialize(b: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * b.set.size)
    bb.putInt(b.k).putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  /** (k, hashes ascending) view of a serialized sketch. */
  def parse(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val out = new Array[Long](bb.getInt)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    (k, out)
  }

  /** θ (exclusive upper bound of the retained sample, in [0,1]):
    * 1.0 while the sketch holds the full distinct set; else hₖ / 2^60.
    */
  def theta(k: Int, hs: Array[Long]): Double =
    if (hs.length < k) 1.0 else hs(hs.length - 1) / HashSpace

  def estimate(k: Int, hs: Array[Long]): Double =
    if (hs.length < k) hs.length.toDouble
    else (k - 1).toDouble / theta(k, hs)

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val (ka, ha) = parse(a)
    val (kb, hb) = parse(b)
    val th = math.min(theta(ka, ha), theta(kb, hb))
    val bound = th * HashSpace
    // both arrays ascending: linear merge-count of common hashes < bound
    var i = 0; var j = 0; var common = 0
    while (i < ha.length && j < hb.length && ha(i) < bound && hb(j) < bound) {
      if (ha(i) == hb(j)) { common += 1; i += 1; j += 1 }
      else if (ha(i) < hb(j)) i += 1
      else j += 1
    }
    common / th
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ka, ha) = parse(a)
    val (kb, hb) = parse(b)
    val out = new Buffer(math.min(ka, kb))
    ha.foreach(out.add)
    hb.foreach(out.add)
    serialize(out)
  }
}

/** `graft_kmv_agg(hash60, k)` — bounded-state distinct sketch aggregate. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] with ExpectsInputTypes {

  require(k >= 2, "kmv sketch needs k >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvSketch.Buffer = new KmvSketch.Buffer(k)

  override def update(buffer: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: KmvSketch.Buffer, b2: KmvSketch.Buffer): KmvSketch.Buffer =
    b1.merge(b2)

  override def eval(buffer: KmvSketch.Buffer): Any = KmvSketch.serialize(buffer)

  override def serialize(buffer: KmvSketch.Buffer): Array[Byte] =
    KmvSketch.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer =
    KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** `graft_kmv_estimate(sketch)` — distinct-count estimate (exact below k). */
case class KmvEstimateExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any = {
    val (k, hs) = KmvSketch.parse(input.asInstanceOf[Array[Byte]])
    KmvSketch.estimate(k, hs)
  }
  override protected def withNewChildInternal(newChild: Expression): KmvEstimateExpr =
    copy(child = newChild)
}

/** `graft_kmv_intersect(a, b)` — intersection-size estimate. */
case class KmvIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_kmv_union(a, b)` — sketch union (k = min of the two). */
case class KmvUnionExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvUnionExpr =
    copy(left = newLeft, right = newRight)
}

object KmvSketchAgg {
  def column(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvSketchAgg(ExpressionUtils.expression(hash), k).toAggregateExpression())
  def estimate(sketch: Column): Column =
    ExpressionUtils.column(KmvEstimateExpr(ExpressionUtils.expression(sketch)))
  def intersect(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvIntersectExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def union(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvUnionExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
