package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-state frequent-items CANDIDATE sketch — Misra–Gries in its
  * mergeable form (Agarwal et al., "Mergeable Summaries", PODS 2012):
  * the buffer holds at most `2k` (item, count) pairs; overflow and
  * merge both TRIM by subtracting the (k+1)-th largest count from
  * every entry and dropping the non-positives.
  *
  * Guarantee (the one the two-pass heavy-hitters query builds on):
  * each trim removes ≥ (k+1)·d total weight while undercounting any
  * single item by ≤ d, so across the whole aggregation the undercount
  * is ≤ N/(k+1). Therefore EVERY item with true count > N/(k+1)
  * survives with a positive count — the output is a SUPERSET of the
  * frequent items, whatever the partitioning and merge order. The
  * counts themselves are approximate and deliberately not exposed:
  * callers re-count the ≤2k candidates exactly in a second pass
  * (broadcast semi-join), which makes the END RESULT deterministic and
  * partitioning-independent even though the sketch is not.
  *
  * Why not `groupBy(token).count()` directly: at 100 TB the token/
  * n-gram vocabulary is itself huge (shuffling every distinct n-gram
  * to count it is a full-corpus shuffle). This aggregate carries at
  * most 2k pairs per map task into one k-bounded merge, and the exact
  * second pass shuffles only rows matching ≤2k candidates.
  *
  * ==Why a [[TypedImperativeAggregate]]==
  * The per-ROW hot path of a corpus-scale aggregation: an earlier
  * `Aggregator[String, Map[String,Long], _]` form paid an immutable-
  * Map copy per input token plus an ExpressionEncoder round-trip of
  * the whole buffer per row; this form mutates one `java.util.HashMap`
  * in place (keys kept as [[UTF8String]] — no per-row decode; counts
  * in a 1-slot `Array[Long]` so increments allocate nothing) and
  * serializes only at partial-aggregate exchange boundaries. NULL
  * input tokens are skipped, like every builtin aggregate.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Array[Long]]] {
  require(k >= 1, s"sketch size k must be >= 1, got $k")

  type Buf = java.util.HashMap[UTF8String, Array[Long]]

  override def createAggregationBuffer(): Buf = new Buf(4 * k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buf // null tokens contribute nothing (builtin-agg contract)
    else updateToken(buf, v.asInstanceOf[UTF8String])
  }

  /** Core increment, shared with the spec's direct-buffer tests. */
  private[functions] def updateToken(buf: Buf, tok: UTF8String): Buf = {
    val slot = buf.get(tok)
    if (slot != null) slot(0) += 1L
    else {
      // copy(): the incoming UTF8String may point into a row buffer
      // the scan reuses — a stored key must own its bytes
      buf.put(tok.copy(), Array(1L))
      if (buf.size > 2 * k) trim(buf)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val slot = a.get(e.getKey)
      if (slot != null) slot(0) += e.getValue()(0)
      else a.put(e.getKey, e.getValue) // b's entries are owned copies
    }
    if (a.size > 2 * k) trim(a)
    a
  }

  /** Subtract the (k+1)-th largest count from every entry IN PLACE,
    * drop the non-positive remainders (≤ k survive).
    */
  private def trim(m: Buf): Unit = {
    val counts = new Array[Long](m.size)
    var i = 0
    val vit = m.values().iterator()
    while (vit.hasNext) { counts(i) = vit.next()(0); i += 1 }
    java.util.Arrays.sort(counts)
    val d = counts(counts.length - 1 - k) // (k+1)-th largest
    val it = m.values().iterator()
    while (it.hasNext) {
      val slot = it.next()
      if (slot(0) > d) slot(0) -= d else it.remove()
    }
  }

  override def eval(buf: Buf): Any = {
    // sort via java.lang.String so the output order matches the
    // original Scala `.sorted` (UTF-16 order; UTF8String.compareTo is
    // UTF-8-byte order, which differs above the BMP) — ≤2k items
    val keys = new Array[String](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next().toString; i += 1 }
    java.util.Arrays.sort(keys, Ordering[String])
    new GenericArrayData(keys.map(UTF8String.fromString(_): Any))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf(math.max(4 * k, n))
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(UTF8String.fromBytes(kb), Array(in.readLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries_candidates"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column form: `MisraGriesAgg.candidates(1023)(col("token"))`. */
  def candidates(k: Int): Column => Column = tok =>
    ColumnBridge.column(
      MisraGriesSketch(ColumnBridge.expression(tok), k).toAggregateExpression())

  /** A standalone sketch for direct buffer-level testing. */
  private[graft] def sketch(k: Int): MisraGriesSketch =
    MisraGriesSketch(Literal(null, StringType), k)
}
