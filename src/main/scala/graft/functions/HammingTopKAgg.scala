package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** One Hamming-space candidate. `ham` is the ranking key (ascending —
  * nearer is better), `nnId` the deterministic tie-break (ascending).
  */
final case class HammingHit(ham: Long, nnId: Long)

/** Bounded top-k over Hamming distances — [[BoundedTopKAgg]] with the
  * ordering `ham ASC, nnId ASC` (nearest first).
  */
final class HammingTopKAgg(k: Int) extends BoundedTopKAgg[HammingHit](k) {

  protected def better(a: HammingHit, b: HammingHit): Boolean =
    a.ham < b.ham || (a.ham == b.ham && a.nnId < b.nnId)

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
