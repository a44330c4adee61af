package graft.sim

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class IvfIndexSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("persisted index: probes prune partitions; recall holds; load() round-trips") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = Files.createTempDirectory("ivf_index").toString
    val index = IvfIndex.build(emb, "vec_id", "embedding", path, nCentroids = 16)

    // partition pruning reaches the scan
    val plan = index.probedScan(Seq(0, 1, 2, 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"),
      s"probe filter did not become a partition filter:\n$plan")

    // recall vs brute force, same contract as the in-memory variants
    val queries = emb.filter(col("vec_id") < 50)
    // the exact re-rank must push the candidate-id set into the raw/
    // scan (a broadcast join alone reads ALL raw files; the id
    // predicate is what lets the id-clustered store prune on stats)
    val rerankPlan = index.topK(queries, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(rerankPlan.contains("In(nn_id"),
      s"raw re-rank scan carries no nn_id id predicate:\n$rerankPlan")
    val exact = CosineSim.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = index.topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 = $recall%.3f")
    assert(recall >= 0.60)

    // load() gives the same results as the just-built handle
    val reloaded = IvfIndex.load(spark, path)
    val again = reloaded.topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === approx)
  }

  test("int8 lists: compact vs the float source on disk, 1 byte/dim " +
    "decoded; exact re-rank restores the un-quantized in-list ranking") {
    // sf0.1 here: per-file parquet overhead must not dominate the
    // size comparison (2000 rows across 16 list partitions)
    val szDir = "/root/testdata/sf0.1"
    val emb = Tables.load(spark, szDir, "embeddings")
    val path = Files.createTempDirectory("ivf_q").toString
    val index = IvfIndex.build(emb, "vec_id", "embedding", path, nCentroids = 16)

    // LIST payload (what every probe reads): 1-byte codes + 2 scalars
    // vs the 4-byte/dim float SOURCE representation. (The naive "1/8
    // of int64" does not show on disk: parquet dictionary-packs
    // milli-quantized int64 to ~11 bits/value — see the IvfIndex
    // scaladoc; decoded bytes per scored candidate are the structural
    // 8× win, pinned below via the schema.)
    def dirBytes(d: java.io.File): Long =
      if (d.isFile) d.length
      else Option(d.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    val floatDir = Files.createTempDirectory("ivf_q_float").toString
    emb.select(col("vec_id"), col("embedding")).orderBy("vec_id")
      .write.mode("overwrite").parquet(floatDir)
    val listB = dirBytes(new java.io.File(s"$path/index"))
    val srcB = dirBytes(new java.io.File(floatDir))
    info(s"list bytes = $listB, float-source bytes = $srcB " +
      f"(ratio ${listB.toDouble / srcB}%.3f)")
    assert(listB > 0 && srcB > 0 && listB * 5 <= srcB * 2,
      s"quantized lists not <= 0.4 of the float source: $listB vs $srcB")
    // decoded payload is 1 byte/dim: codes are BINARY of exactly dim
    // bytes (an array<long> decodes to 8 bytes/dim)
    val idx = spark.read.parquet(s"$path/index")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    assert(idx.schema("code").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(idx.select(max(length(col("code")))).head().getInt(0) === dim)

    // the served (q_id, rank, nn_id, dot) must equal the exact cosine
    // ranking over the SAME probed lists — i.e. the re-rank fully
    // undoes the int8 approximation (the ann_ivf_index_topk oracle
    // depends on exactly this)
    val queries = emb.filter(col("vec_id") < 50)
    val served = index.topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "rank", "nn_id", "dot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // replay: probe the same lists, score candidates exactly from raw
    val cdf = spark.read.parquet(s"$path/centroids")
    val qq = queries.select(col("vec_id").as("q_id"),
      CosineSim.quantize(col("embedding")).as("qq"))
      .withColumn("na", graft.functions.LongArrayDot(col("qq"), col("qq")))
      .crossJoin(broadcast(cdf))
      .withColumn("neg_sim",
        -graft.functions.LongArrayDot(col("qq"), col("cvec")).cast("double") /
          col("cnorm"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("neg_sim").asc, col("cid").asc)
    val probes = qq.withColumn("rn", row_number().over(pw))
      .filter(col("rn") <= 4)
      .select(col("q_id"), col("qq"), col("na"), col("cid").as("list_id"))
    val exactInList = spark.read.parquet(s"$path/index")
      .join(new graft.lake.IncrementalTable(spark, s"$path/raw").snapshot(),
        Seq("nn_id"))
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("nn_id"))
      .withColumn("dot", graft.functions.LongArrayDot(col("qq"), col("cq")))
      .withColumn("sim",
        col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("nn_id").asc)).cast("long"))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "nn_id", "dot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(served === exactInList,
      s"re-rank failed to restore the exact in-list ranking; " +
        s"diff=${(served diff exactInList).take(5)} / ${(exactInList diff served).take(5)}")
  }

  test("append grows the index without retraining; appended vectors are findable") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = Files.createTempDirectory("ivf_index_app").toString
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    val index = IvfIndex.build(first, "vec_id", "embedding", path, nCentroids = 16)
    index.append(second, "vec_id", "embedding")

    val queries = emb.filter(col("vec_id") < 50)
    val exact = CosineSim.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = index.topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 after append = $recall%.3f")
    assert(recall >= 0.55) // appended half assigned to frozen centroids
    // odd-id (appended) neighbors do surface in results
    assert(approx.exists(_._2 % 2 == 1), "appended vectors never retrieved")
    // a reloaded handle sees the appended rows too
    assert(IvfIndex.load(spark, path).topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === approx)
  }

  test("drift signal: in-distribution appends hold ratio ~1; a shifted " +
    "corpus pulls it down — the silent-recall-decay detector") {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val path = Files.createTempDirectory("ivf_index_drift").toString
    val first = emb.filter(col("vec_id") % 2 === 0)
    val index = IvfIndex.build(first, "vec_id", "embedding", path,
      nCentroids = 16)
    val base = index.drift()
    // right after build, the full-store sample IS the training corpus
    assert(math.abs(base.ratio - 1.0) < 1e-9,
      s"fresh index must read ratio 1, got ${base.ratio}")
    assert(base.trainedRows === first.count())
    // in-distribution growth: copies of TRAINED vectors under fresh
    // ids — the exact null case (a held-out half of a 500-row corpus
    // against 16 overfit centroids shows a real generalization gap,
    // ~0.78 here; that's honest drift, not noise, so the null must be
    // distribution-identical)
    index.append(first.withColumn("vec_id", col("vec_id") + 500000L),
      "vec_id", "embedding")
    val inDist = index.drift()
    assert(inDist.ratio > 0.97 && inDist.ratio < 1.03,
      s"in-distribution appends must hold ratio ~1, got ${inDist.ratio}")
    // distribution SHIFT: vectors concentrated on one axis direction
    // the trained centroids never saw — assignment cosines collapse
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val shifted = (0 until 500).map { i =>
      val v = Array.fill(dim)(0.001f * ((i * 7) % 5))
      v(i % dim) = 1.0f
      (1000000L + i, v.toSeq)
    }.toDF("vec_id", "embedding")
    index.append(shifted, "vec_id", "embedding")
    val drifted = index.drift()
    assert(drifted.ratio < inDist.ratio - 0.02,
      s"a shifted corpus must pull the drift ratio down: " +
        s"${inDist.ratio} -> ${drifted.ratio}")
    // pre-baseline indexes refuse loudly rather than guessing
    val legacy = Files.createTempDirectory("ivf_index_nostats").toString
    IvfIndex.build(first.limit(300), "vec_id", "embedding", legacy,
      nCentroids = 4)
    val st = new java.io.File(s"$legacy/stats")
    st.listFiles().foreach(_.delete()); st.delete()
    val e = intercept[IllegalArgumentException](
      IvfIndex.load(spark, legacy).drift())
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }

  test("drift lifecycle: append FOLDS a rolling current mean (drift() " +
    "is O(metadata)); driftMeasured() audits storage and sees takedowns") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = Files.createTempDirectory("ivf_drift_roll").toString
    val first = emb.filter(col("vec_id") % 2 === 0)
    val index = IvfIndex.build(first, "vec_id", "embedding", path,
      nCentroids = 16)
    val n0 = first.count()

    // in-distribution append: rolling stat grows, ratio holds — no trip
    index.append(first.withColumn("vec_id", col("vec_id") + 500000L),
      "vec_id", "embedding")
    val d1 = index.drift()
    assert(d1.sampledRows === 2 * n0,
      "rolling n must count trained + appended rows")
    assert(d1.ratio > 0.97 && d1.ratio < 1.03, s"null tripped: ${d1.ratio}")

    // drift() is O(metadata): after a takedown the rolling n is
    // UNCHANGED (assign-time stat, removal-scale bias documented),
    // while driftMeasured() — the storage audit — sees the rows gone
    index.remove((0L until 20L by 2L).map(i => i: java.lang.Long))
    val roll = index.drift()
    val meas = index.driftMeasured()
    assert(roll.sampledRows === 2 * n0, "rolling stat must not rescan")
    assert(meas.sampledRows === 2 * n0 - 10,
      s"measured audit must mask tombstones: ${meas.sampledRows}")
  }

  test("remove: a retracted id never serves again (probe AND re-rank), " +
    "survivors keep their slots, re-removal is idempotent") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = Files.createTempDirectory("ivf_rm").toString
    val index = IvfIndex.build(emb, "vec_id", "embedding", path, nCentroids = 16)
    val queries = emb.filter(col("vec_id") < 50)
    def served() = index.topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val before = served()

    // retract the 3 most-served neighbors — the exact ids the probe
    // path most wants to serve
    val hot = before.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (id, n) => (-n, id) }.take(3).map(_._1)
    index.remove(hot)
    val after = served()
    assert(after.nonEmpty && after.forall { case (_, nn) => !hot.contains(nn) },
      s"retracted ids still served: ${after.filter(p => hot.contains(p._2)).take(5).toSeq}")
    // removals only VACATE slots: every surviving pre-removal pair is
    // still in the post-removal top-5 (recall on the remainder intact)
    val survivors = before.filterNot(p => hot.contains(p._2)).toSet
    assert(survivors.subsetOf(after.toSet),
      s"survivor pairs lost: ${(survivors diff after.toSet).take(5)}")

    // physical deletion in the id-clustered raw store, not just a mask
    assert(new graft.lake.IncrementalTable(spark, s"$path/raw").snapshot()
      .filter(col("nn_id").isInCollection(hot)).count() === 0L)

    // idempotent re-removal; a reloaded handle serves the same
    index.remove(hot)
    assert(served().toSet === after.toSet)
    assert(IvfIndex.load(spark, path).topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === after.toSet)

    // re-appending a retracted id refuses LOUDLY (the mask would hide
    // it silently; re-admission is an explicit rebuild)
    val e = intercept[IllegalArgumentException] {
      index.append(emb.filter(col("vec_id") === hot.head), "vec_id", "embedding")
    }
    assert(e.getMessage.contains("retracted"))
    // a clean-id append still works with tombstones present
    index.append(
      emb.filter(col("vec_id") === 1L)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding")
    assert(served().toSet.nonEmpty)
  }

  test("load fails fast on the legacy raw-store layout (plain parquet, no _log)") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = Files.createTempDirectory("ivf_legacy").toString
    IvfIndex.build(emb.limit(200), "vec_id", "embedding", path, nCentroids = 4)
    // degrade raw/ to the pre-int8 layout: same parquet rows, no _log
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw = new graft.lake.IncrementalTable(spark, s"$path/raw").snapshot()
      .localCheckpoint()
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/raw"), true)
    raw.write.parquet(s"$path/raw")
    val e = intercept[IllegalStateException](IvfIndex.load(spark, path))
    assert(e.getMessage.contains("rebuild the index"), e.getMessage)
  }
}
