package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One Hamming-space candidate. `ham` is the ranking key (ascending —
  * nearer is better), `nnId` the deterministic tie-break (ascending).
  */
final case class HammingHit(ham: Long, nnId: Long)

/** Bounded top-k aggregate over Hamming distances — [[TopKAgg]]'s
  * construction with the ordering flipped to ascending distance: keeps
  * the k NEAREST [[HammingHit]]s per group in a fixed-size buffer with
  * map-side partial aggregation, so the shuffle carries at most k rows
  * per (group, partition) instead of the full candidate set a window
  * rank would sort. Ordering contract: `ham ASC, nnId ASC`.
  */
final class HammingTopKAgg(k: Int)
    extends Aggregator[HammingHit, Array[HammingHit], Array[HammingHit]] {

  private def better(a: HammingHit, b: HammingHit): Boolean =
    a.ham < b.ham || (a.ham == b.ham && a.nnId < b.nnId)

  override def zero: Array[HammingHit] = Array.empty

  override def reduce(buf: Array[HammingHit], x: HammingHit): Array[HammingHit] =
    if (buf.length >= k && better(buf(buf.length - 1), x)) buf
    else insert(buf, x)

  private def insert(buf: Array[HammingHit], x: HammingHit): Array[HammingHit] = {
    var i = 0
    while (i < buf.length && better(buf(i), x)) i += 1
    if (i < buf.length && buf(i) == x) return buf // exact dup collapses
    val n = math.min(buf.length + 1, k)
    val out = new Array[HammingHit](n)
    System.arraycopy(buf, 0, out, 0, math.min(i, n))
    if (i < n) {
      out(i) = x
      if (i + 1 < n) System.arraycopy(buf, i, out, i + 1, n - i - 1)
    }
    out
  }

  override def merge(a: Array[HammingHit], b: Array[HammingHit]): Array[HammingHit] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Array[HammingHit]): Array[HammingHit] = buf

  override def bufferEncoder: Encoder[Array[HammingHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[HammingHit]]()
  override def outputEncoder: Encoder[Array[HammingHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[HammingHit]]()
}

object HammingTopKAgg {
  /** Column form: `HammingTopKAgg(5)(col("hamming"), col("nn_id"))`. */
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new HammingTopKAgg(k), Encoders.product[HammingHit])
    (ham, nnId) => fn(ham, nnId)
  }
}
