package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.lake.IncrementalTable
import graft.multimodal.{ImageDedup, SignatureDedup}

/** Persistent UNIT-SIGNATURE index for incremental ALIGNMENT-FREE
  * media dedup — [[FingerprintDedupIndex]]'s daily-ingest shape for
  * clips that are BAGS of unit signatures (video shot signatures,
  * audio block fingerprints — [[SignatureDedup]]'s data model): a
  * whole-clip fingerprint cannot serve trimmed near-dups, so the
  * index stores one band row PER UNIT
  * (`(band, bv, id, unit, h_hi, h_lo)`, write-ordered (band, bv) for
  * stats-pruned batch scans) and a batch clip is `dup_corpus` iff
  * some indexed clip passes the SAME symmetric overlap gate the
  * in-memory matcher uses: at least `minMatched` DISTINCT units
  * within `maxHamming` on EACH side (a repeated unit cannot qualify
  * through multiplicity).
  *
  * The decision protocol is the fingerprint indexes' verbatim:
  * batch band rows broadcast against the pruned index scan (the big
  * side streams), `dup_corpus` / `dup_batch` (intra-batch
  * [[SignatureDedup]] pairs close into min-label components) /
  * `kept`; admits append the kept clips' unit rows under a
  * `sig_admit[batch=N]` watermark (idempotent replay); takedown masks
  * a clip's unit rows merge-on-read. Implements
  * [[FingerprintIndexLike]], so the decisions-first streaming sink
  * ([[graft.streaming.Streams.mediaDedupSink]]) serves it unchanged —
  * micro-batches of unit rows in, per-clip decisions out.
  */
class SignatureDedupIndex(
    spark: SparkSession, val base: String, idCol: String, unitCol: String,
    maxHamming: Int, minMatched: Int, bandBits: Int = 16,
    maxBucketSize: Int = Int.MaxValue) extends FingerprintIndexLike {

  ImageDedup.requireExactPigeonhole(maxHamming, bandBits)
  require(minMatched >= 1, s"minMatched=$minMatched must be >= 1")

  def decisionIdCol: String = idCol

  /** Decisions are per CLIP over multiple unit rows — the streaming
    * sink enforces clip atomicity for this index (trait doc).
    */
  override def decidesPerClip: Boolean = true

  val fpTable = new IncrementalTable(spark, s"$base/units")

  /** Data-bearing commit exists (the shared crash-convergence rule). */
  def exists: Boolean = fpTable.exists && fpTable.latestVersion.exists(_ >= 1)

  private def bandRows(units: DataFrame): DataFrame =
    ImageDedup.bandExploded(
      units.select(col(idCol), col(unitCol), col("h_hi"), col("h_lo")),
      bandBits)
      .select(col("band"), col("bv"), col(idCol), col(unitCol),
        col("h_hi"), col("h_lo"))

  def bootstrap(units: DataFrame): Unit = {
    require(!exists, s"signature index at $base is already bootstrapped")
    if (!fpTable.exists) fpTable.setWriteOrder("band", "bv")
    fpTable.append(bandRows(units))
  }

  private def prunedScan(bvs: Seq[Any]): DataFrame =
    if (bvs.nonEmpty && bvs.size <= CorpusDedupIndex.MaxKeysInPredicate)
      fpTable.scan(col("bv").isInCollection(bvs))
    else fpTable.snapshot()

  /** Near-dup decisions for a batch of unit rows `(idCol, unitCol,
    * h_hi, h_lo)` against the index ∪ the batch itself: one row per
    * batch CLIP, `(idCol, status ∈ kept|dup_corpus|dup_batch, kept)`.
    */
  def dedupBatch(units: DataFrame): DataFrame = {
    require(exists, s"signature index at $base is not bootstrapped")
    val batch = units
      .select(col(idCol), col(unitCol), col("h_hi"), col("h_lo"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val newBands = ImageDedup.capBuckets(bandRows(batch), maxBucketSize,
      "band", "bv")
    val bvs = newBands.select("bv").distinct()
      .limit(CorpusDedupIndex.MaxKeysInPredicate + 1)
      .collect().map(_.getLong(0)).toSeq
    // matched unit pairs between batch clips and indexed clips: banded
    // candidates, exact popcount per collision, then the distinct
    // carries bare (clip, unit) tuples. corpus_id =!= new_id is the
    // replayed-batch self-match guard
    val matched = prunedScan(bvs)
      .select(col("band"), col("bv"), col(idCol).as("corpus_id"),
        col(unitCol).as("cu"), col("h_hi").as("chi"), col("h_lo").as("clo"))
      .join(broadcast(newBands
        .select(col("band"), col("bv"), col(idCol).as("new_id"),
          col(unitCol).as("nu"), col("h_hi").as("nhi"),
          col("h_lo").as("nlo"))),
        Seq("band", "bv"))
      .filter(col("corpus_id") =!= col("new_id"))
      .filter((bit_count(col("chi").bitwiseXOR(col("nhi"))) +
        bit_count(col("clo").bitwiseXOR(col("nlo")))) <= maxHamming)
      .select("corpus_id", "cu", "new_id", "nu")
      .distinct()
    // the symmetric overlap gate, per (corpus clip, batch clip)
    val crossDup = matched
      .groupBy("corpus_id", "new_id")
      .agg(countDistinct(col("nu")).as("mn"),
        countDistinct(col("cu")).as("mc"))
      .filter(least(col("mn"), col("mc")) >= minMatched)
      .select("new_id").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val intraPairs = SignatureDedup
      .nearDupPairsBySignature(batch, idCol, unitCol, maxHamming,
        minMatched, bandBits, maxBucketSize)
      .join(crossDup.withColumnRenamed("new_id", "id_a"), Seq("id_a"),
        "left_anti")
      .join(crossDup.withColumnRenamed("new_id", "id_b"), Seq("id_b"),
        "left_anti")
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val comps = Clusters.connectedComponents(intraPairs)
    val decisions = batch.select(col(idCol)).distinct()
      .join(crossDup.withColumnRenamed("new_id", idCol)
        .withColumn("__dc", lit(1)), Seq(idCol), "left")
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__dc") === 1, lit("dup_corpus"))
          .when(col("cluster_id").isNotNull && col("cluster_id") =!= col(idCol),
            lit("dup_batch"))
          .otherwise(lit("kept")).as("status"))
      .withColumn("kept", (col("status") === "kept").cast("long"))
      .localCheckpoint()
    Seq(batch, crossDup).foreach(_.unpersist(blocking = false))
    decisions
  }

  def admit(units: DataFrame, decisions: DataFrame): Unit =
    admitImpl(units, decisions, None)

  def admitIdempotent(units: DataFrame, decisions: DataFrame,
      batchId: Long): Unit = admitImpl(units, decisions, Some(batchId))

  private def admitImpl(units: DataFrame, decisions: DataFrame,
      batchId: Option[Long]): Unit = {
    val keptIds = decisions.filter(col("kept") === 1L).select(idCol)
    val kept = units.join(broadcast(keptIds), Seq(idCol), "left_semi")
    val rows = bandRows(kept)
    batchId match {
      case None => fpTable.append(rows)
      case Some(id) =>
        if (!SignatureDedupIndex.admitWatermark(fpTable).exists(id <= _))
          fpTable.commitFiles(fpTable.stage(fpTable.orderForWrite(rows)),
            Set.empty, s"sig_admit[batch=$id]", schema = Some(rows.schema))
    }
  }

  /** Merge-on-read takedown of whole CLIPS (every unit row masked). */
  def remove(ids: Seq[Any]): Unit = {
    require(exists, s"signature index at $base is not bootstrapped")
    require(ids.nonEmpty, "remove: empty id set")
    fpTable.deleteVector(col(idCol).isInCollection(ids))
  }
}

object SignatureDedupIndex {
  private val AdmitOp = """sig_admit\[batch=(\d+)\]""".r

  private[graft] def admitWatermark(t: IncrementalTable): Option[Long] =
    t.latestOpId(AdmitOp)
}
