package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k >= 1, s"sketch size k must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] = {
    val up = buf.updated(tok, buf.getOrElse(tok, 0L) + 1L)
    if (up.size > 2 * k) trim(up) else up
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    val combined = small.foldLeft(big) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size > 2 * k) trim(combined) else combined
  }

  /** Subtract the (k+1)-th largest count from every entry, keep the
    * positive remainders (≤ k of them).
    */
  private def trim(m: Map[String, Long]): Map[String, Long] = {
    val counts = m.valuesIterator.toArray
    java.util.Arrays.sort(counts)
    val d = counts(counts.length - 1 - k) // (k+1)-th largest
    m.collect { case (t, c) if c > d => t -> (c - d) }
  }

  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keysIterator.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}

object MisraGriesAgg {
  /** Column form: `MisraGriesAgg.candidates(1023)(col("token"))`. */
  def candidates(k: Int): Column => Column = {
    val fn = udaf(new MisraGriesAgg(k), Encoders.STRING)
    tok => fn(tok)
  }
}
