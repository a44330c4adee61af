package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** One scored ANN candidate. `sim` is the ranking key (descending),
  * `nnId` the deterministic tie-break (ascending).
  */
final case class ScoredHit(sim: Double, nnId: Long, dot: Long, na: Long, nb: Long)

/** Bounded top-k over similarity scores — [[BoundedTopKAgg]] with the
  * ordering `sim DESC, nnId ASC` (matches the window formulation the
  * ANN finishers replaced).
  */
final class TopKAgg(k: Int) extends BoundedTopKAgg[ScoredHit](k) {

  protected def better(a: ScoredHit, b: ScoredHit): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.nnId < b.nnId)

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
