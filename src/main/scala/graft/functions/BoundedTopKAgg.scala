package graft.functions

import scala.reflect.ClassTag

import org.apache.spark.sql.expressions.Aggregator

/** Shared bounded top-k buffer behind [[TopKAgg]] (descending
  * similarity) and [[HammingTopKAgg]] (ascending distance): keeps the
  * k best elements per group in a fixed-size sorted array with
  * map-side partial aggregation, so the shuffle carries at most k rows
  * per (group, partition) — a window rank would shuffle AND sort the
  * full candidate set first. Concrete aggregates supply only the
  * ordering ([[better]]) and their encoders; the insert/merge boundary
  * logic lives once.
  *
  * Buffer is a plain sorted Array (k is small — heap constant factors
  * lose to arraycopy below ~100 elements). Exact duplicates collapse
  * (value equality), so re-delivered rows cannot crowd out real hits.
  */
abstract class BoundedTopKAgg[T <: AnyRef : ClassTag](k: Int)
    extends Aggregator[T, Array[T], Array[T]] {

  /** Strict "a ranks ahead of b": a total order whose tie-break is
    * deterministic, so the k-th cut never depends on arrival order. */
  protected def better(a: T, b: T): Boolean

  final override def zero: Array[T] = Array.empty[T]

  final override def reduce(buf: Array[T], x: T): Array[T] =
    if (buf.length >= k && better(buf(buf.length - 1), x)) buf
    else insert(buf, x)

  private def insert(buf: Array[T], x: T): Array[T] = {
    var i = 0
    while (i < buf.length && better(buf(i), x)) i += 1
    if (i < buf.length && buf(i) == x) return buf // exact dup collapses
    val n = math.min(buf.length + 1, k)
    val out = new Array[T](n)
    System.arraycopy(buf, 0, out, 0, math.min(i, n))
    if (i < n) {
      out(i) = x
      if (i + 1 < n) System.arraycopy(buf, i, out, i + 1, n - i - 1)
    }
    out
  }

  final override def merge(a: Array[T], b: Array[T]): Array[T] =
    b.foldLeft(a)(reduce)

  final override def finish(buf: Array[T]): Array[T] = buf
}
