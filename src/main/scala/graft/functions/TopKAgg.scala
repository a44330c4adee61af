package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored ANN candidate. `sim` is the ranking key (descending),
  * `nnId` the deterministic tie-break (ascending).
  */
final case class ScoredHit(sim: Double, nnId: Long, dot: Long, na: Long, nb: Long)

/** Bounded top-k aggregate: keeps the k best [[ScoredHit]]s per group
  * in a fixed-size buffer with map-side partial aggregation.
  *
  * Why not a window: `row_number().over(partitionBy(q).orderBy(sim))`
  * must SHUFFLE AND SORT every candidate row before it can rank — at
  * scale that is the full candidate set over the wire. This aggregate
  * truncates to k rows per group inside each map task and merges
  * k-sized buffers on the reduce side, so the shuffle carries at most
  * k rows per (group, partition). The ordering contract matches the
  * window formulation exactly: `sim DESC, nnId ASC`.
  *
  * Buffer is a plain sorted Array (k is small — heap constant factors
  * lose to arraycopy below ~100 elements).
  */
final class TopKAgg(k: Int) extends Aggregator[ScoredHit, Array[ScoredHit], Array[ScoredHit]] {

  private def better(a: ScoredHit, b: ScoredHit): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.nnId < b.nnId)

  override def zero: Array[ScoredHit] = Array.empty

  override def reduce(buf: Array[ScoredHit], x: ScoredHit): Array[ScoredHit] =
    if (buf.length >= k && better(buf(buf.length - 1), x)) buf
    else insert(buf, x)

  private def insert(buf: Array[ScoredHit], x: ScoredHit): Array[ScoredHit] = {
    var i = 0
    while (i < buf.length && better(buf(i), x)) i += 1
    if (i < buf.length && buf(i) == x) return buf // exact dup collapses
    val n = math.min(buf.length + 1, k)
    val out = new Array[ScoredHit](n)
    System.arraycopy(buf, 0, out, 0, math.min(i, n))
    if (i < n) {
      out(i) = x
      if (i + 1 < n) System.arraycopy(buf, i, out, i + 1, n - i - 1)
    }
    out
  }

  override def merge(a: Array[ScoredHit], b: Array[ScoredHit]): Array[ScoredHit] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Array[ScoredHit]): Array[ScoredHit] = buf

  override def bufferEncoder: Encoder[Array[ScoredHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredHit]]()
  override def outputEncoder: Encoder[Array[ScoredHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredHit]]()
}

object TopKAgg {
  /** Column form: `topK(5)(col("sim"), col("nn_id"), ...)`. */
  def apply(k: Int): (Column, Column, Column, Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[ScoredHit])
    (sim, nnId, dot, na, nb) => fn(sim, nnId, dot, na, nb)
  }
}
