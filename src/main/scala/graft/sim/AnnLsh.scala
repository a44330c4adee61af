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
    // Bucket hashing is ONE codegen'd SignBuckets node per side (the
    // shared deterministic hyperplane family — identical values to the
    // previous tables×planes literal-LongArrayDot columns, which baked
    // a dim-length array literal per plane into the plan and needed a
    // driver dim-probe job). Table t uses plane indices
    // [t*planes, (t+1)*planes) — independent sets.
    val c = corpus.select(col(idCol).as("nn_id"),
      CosineSim.quantize(col(vecCol)).as("cq"))
      .withColumn("nb", CosineSim.normQ(col("cq")))
      .select(col("nn_id"), col("cq"), col("nb"),
        posexplode(graft.functions.SignBuckets(col("cq"), planes, tables))
          .as(Seq("__t", "__b")))
      .withColumn("tb", struct(col("__t").as("t"), col("__b").as("b")))
      .drop("__t", "__b")
    val q0 = queries.select(col(idCol).as("q_id"),
      CosineSim.quantize(col(vecCol)).as("qq"))
      .withColumn("na", CosineSim.normQ(col("qq")))
      .withColumn("__bk",
        graft.functions.SignBuckets(col("qq"), planes, tables))
    // multiprobe variants are cheap element_at/xor columns over the
    // one hashed array — no extra dot products
    val probes = q0.withColumn("tb",
      explode(array((0 until tables).flatMap { t =>
        val b = element_at(col("__bk"), t + 1)
        struct(lit(t).as("t"), b.as("b")) +: (if (!multiprobe) Nil
        else (0 until planes).map(j =>
          struct(lit(t).as("t"), b.bitwiseXOR(lit(1L << j)).as("b"))))
      }: _*)))
      .drop("__bk")
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
