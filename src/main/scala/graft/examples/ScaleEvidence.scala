package graft.examples

import java.util.SplittableRandom
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

/** Empirical 1×/10× scaling evidence for SCALE.md.
  *
  * [[ScaleProbe]] replicates the corpus (exact-dup clusters grow
  * quadratically — a deliberately adversarial load). This harness is the
  * complementary NATURAL experiment the round-7 verdict prescribed:
  * generate fresh corpora at 1× and 10× with the SAME seeded generator
  * (constant near-dup rate, constant cluster structure — the way a real
  * corpus grows), run the two flagship scale paths exactly as registered
  * (`dedup_minhash_lsh`, `ann_ivf_index_topk`), and measure wall-clock
  * plus shuffle bytes via a stage-completion listener. A ~10× corpus
  * should cost ~10× shuffle and ~linear time; an all-pairs design would
  * cost ~100×. `SPARK_GRAFT_SCALE_FOIL=1` additionally runs the exact
  * all-pairs `dedup_embedding` baseline at both scales to print that
  * quadratic for contrast.
  *
  * The generator mimics the driver testdata's sf0.1 distributions
  * (measured 2026-08-14): docs of 10–100 words drawn from a ~40-word
  * vocabulary (so shingles genuinely collide across unrelated docs —
  * the hot-bucket load is real, not a best case), 5 langs, 20 sources;
  * every 10th doc is a near-dup of its predecessor with one token
  * edited (constant dup rate ⇒ pair count should grow ~linearly).
  * Embeddings are 64-dim floats in 10 label clusters (center + noise).
  * Rows derive ONLY from their id (SplittableRandom seeded per row), so
  * the corpus is identical whatever the partitioning.
  *
  * Run: sbt "runMain graft.examples.ScaleEvidence [scales]"
  *      e.g. scales = "1,10" (default)
  */
object ScaleEvidence {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

  private val Vocab: Array[String] = Array(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "join", "merge", "table", "query", "index", "cache", "disk", "read",
    "write", "plan", "stage", "task", "shuffle", "broadcast", "skew",
    "limit", "window", "range", "key", "row", "file", "page", "block",
    "stat")
  private val Langs = Array("en", "de", "fr", "es", "zh")
  private val Dim = 64
  private val Labels = 10

  /** Tokens for doc `id` BEFORE dup injection — pure function of id.
    *
    * The per-doc seed multiplier must NOT be SplittableRandom's golden
    * gamma (0x9e3779b97f4a7c15): seeds spaced by exact gamma multiples
    * make doc id+1's draw stream doc id's stream SHIFTED BY ONE — every
    * doc becomes a sliding window of one global token stream and the
    * corpus fills with accidental near-dups (measured: 12k spurious
    * Jaccard≥0.3 pairs in 5k docs before this constant changed).
    */
  private def baseTokens(seed: Long, id: Long): Array[String] = {
    val r = new SplittableRandom(seed ^ (id * 0x2545f4914f6cdd1dL))
    Array.fill(10 + r.nextInt(91))(Vocab(r.nextInt(Vocab.length)))
  }

  private def doc(seed: Long, id: Long): Doc = {
    val r = new SplittableRandom(seed ^ (id * 0xc2b2ae3d27d4eb4fL))
    // every 10th doc: near-dup of its predecessor, one token edited —
    // the dup RATE is constant in corpus size, so found-pair count
    // should scale ~linearly (replication-style exact dups would not)
    val toks =
      if (id % 10 == 9 && id > 0) {
        val t = baseTokens(seed, id - 1).clone()
        t(r.nextInt(t.length)) = Vocab(r.nextInt(Vocab.length))
        t
      } else baseTokens(seed, id)
    val text = toks.mkString(" ")
    Doc(id, text, Langs(r.nextInt(Langs.length)),
      s"src${r.nextInt(20)}", text.length.toLong)
  }

  private def emb(seed: Long, id: Long): Emb = {
    val label = (id % Labels).toInt
    val c = new SplittableRandom(seed * 31 + label)
    val r = new SplittableRandom(seed ^ (id * 0xff51afd7ed558ccdL))
    val v = Array.tabulate(Dim)(_ =>
      (c.nextDouble() * 2 - 1).toFloat) // per-label center...
    Emb(id, v.map(x => x + 0.3f * (r.nextDouble() * 2 - 1).toFloat), label)
  }

  /** Write documents+embeddings parquet for `n` docs under `dir`. */
  def genCorpus(spark: SparkSession, dir: String, nDocs: Long,
      nVecs: Long, seed: Long): Unit = {
    import spark.implicits._
    spark.range(nDocs).map(r => doc(seed, r))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.range(nVecs).map(r => emb(seed, r))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** Sums shuffle read/write bytes over completed stages. Listener
    * delivery is async, so [[drain]] polls until the tallies go quiet.
    */
  private final class ShuffleTally extends SparkListener {
    val read = new AtomicLong
    val write = new AtomicLong
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snapshot: (Long, Long) = (read.get, write.get)
    def drain(): Unit = {
      var last = snapshot
      var quietMs = 0
      val t0 = System.currentTimeMillis()
      while (quietMs < 500 && System.currentTimeMillis() - t0 < 10000) {
        Thread.sleep(100)
        val now = snapshot
        if (now == last) quietMs += 100 else { quietMs = 0; last = now }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "dedup_minhash_lsh" -> graft.ops.PipelineQueries.dedupMinhashLsh _,
      "ann_ivf_index_topk" -> graft.ops.PipelineQueries.annIvfIndexTopK _
    ) ++ (if (sys.env.get("SPARK_GRAFT_SCALE_FOIL").contains("1"))
      Seq("dedup_embedding(all-pairs foil)" ->
        graft.ops.PipelineQueries.dedupEmbedding _)
    else Nil)

    def measured(f: => Long): (Long, Double, Long, Long) = {
      tally.drain()
      val (r0, w0) = tally.snapshot
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      tally.drain()
      val (r1, w1) = tally.snapshot
      (rows, secs, r1 - r0, w1 - w0)
    }

    /** Experiment 3: incremental-view refresh cost vs source size.
      * A 5-key change against a 1×/10× source: the affected-key
      * refresh should stay ~FLAT (O(changed groups) through pruned
      * scans) while the initial full materialization grows with the
      * source. Prints wall times plus the refresh's own file-pruning
      * metrics.
      */
    def viewExperiment(base: java.nio.file.Path, k: Int): Unit = {
      import spark.implicits._
      val n = 100000L * k
      val groups = n / 10
      val src = new graft.lake.IncrementalTable(spark, s"$base/mv_x$k/src")
      val df = spark.range(n).select(
        (org.apache.spark.sql.functions.pmod(col("id"), lit(groups)))
          .as("gk"),
        (col("id") * 17L % 1000L).as("v"))
      src.append(df.repartitionByRange(16, col("gk"))
        .sortWithinPartitions("gk"))
      val t0 = System.nanoTime()
      val view = graft.lake.IncrementalView.create(spark, src,
        s"$base/mv_x$k/v", Seq("gk"),
        Seq("cnt" -> "count(*)", "total" -> "sum(v)", "top" -> "max(v)"),
        targetFiles = 16)
      val buildS = (System.nanoTime() - t0) / 1e9
      src.updateWhere(col("gk").isin(1L, 7L, 42L, 99L, 123L),
        Map("v" -> (col("v") + 100000L)))
      val t1 = System.nanoTime()
      view.refresh(targetFiles = 16)
      val refreshS = (System.nanoTime() - t1) / 1e9
      val m = view.lastRefresh.get
      println(f"""{"scale":$k,"experiment":"incr_view","rows":$n,""" +
        f""""groups":$groups,"full_build_s":$buildS%.2f,""" +
        f""""sparse_refresh_s":$refreshS%.2f,"mode":"${m.mode}",""" +
        f""""touched":${m.touchedGroups},""" +
        f""""src_files":[${m.sourceFilesScanned},${m.sourceFilesTotal}],""" +
        f""""view_files":[${m.viewFilesRewritten},${m.viewFilesTotal}]}""")
    }

    /** Experiment 5: JOIN-VIEW delta refresh cost vs fact size. A
      * star-schema view (fact ⋈ dim GROUP BY a dim attribute) is
      * delta-maintained, so a CONSTANT-size fact change (500 updated
      * rows) should refresh in ~flat time and shuffle whatever the
      * fact size — the delta is aggregated, the fact never re-scanned
      * — while the initial full materialization grows with the fact.
      */
    def joinViewExperiment(base: java.nio.file.Path, k: Int): Unit = {
      val n = 100000L * k
      val fact = new graft.lake.IncrementalTable(spark, s"$base/jv_x$k/fact")
      val dim = new graft.lake.IncrementalTable(spark, s"$base/jv_x$k/dim")
      dim.append(spark.range(1000L).select(col("id").as("dk"),
        pmod(col("id"), lit(25L)).cast("string").as("nation")).coalesce(1))
      fact.append(spark.range(n).select(col("id").as("fk"),
        pmod(col("id"), lit(1000L)).as("ck"),
        (col("id") * 17L % 1000L).as("v"))
        .repartitionByRange(16, col("fk")).sortWithinPartitions("fk"))
      val t0 = System.nanoTime()
      val view = graft.lake.IncrementalJoinView.create(spark, fact,
        Seq(graft.lake.DimSpec(s"$base/jv_x$k/dim", "ck", "dk")),
        s"$base/jv_x$k/view", Seq("nation"),
        Seq("cnt" -> "count(*)", "total" -> "sum(v)"), targetFiles = 4)
      val buildS = (System.nanoTime() - t0) / 1e9
      fact.updateWhere(col("fk") < 500L, Map("v" -> (col("v") + 7L)))
      val (_, refreshS, rd, wr) = measured { view.refresh(targetFiles = 4) }
      val m = view.lastRefresh.get
      println(f"""{"scale":$k,"experiment":"join_view","fact_rows":$n,""" +
        f""""full_build_s":$buildS%.2f,"delta_refresh_s":$refreshS%.2f,""" +
        f""""mode":"${m.mode}","touched_groups":${m.touchedGroups},""" +
        f""""refresh_shuffle_rw_mb":[${rd / 1e6}%.1f,${wr / 1e6}%.1f]}""")
    }

    /** Experiment 4: INCREMENTAL dedup cost vs corpus size. Bootstrap
      * the persistent LSH index on the 1×/10× corpus, then dedup a
      * CONSTANT-size batch (250 near-dups of corpus docs + 250 fresh)
      * against each. The batch cost should stay ~flat — candidate
      * generation broadcasts the batch against the narrow bands table
      * and verification reads candidate-pruned shingle files — while
      * the one-time bootstrap grows with the corpus. An engine that
      * re-deduped corpus ∪ batch would scale with the corpus instead.
      */
    def incDedupExperiment(base: java.nio.file.Path, k: Int): Unit = {
      import spark.implicits._
      val dir = s"$base/x$k"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val idx = new graft.dedup.CorpusDedupIndex(spark, s"$base/incidx_x$k",
        "doc_id", "text", n = 3, k = 8, bands = 4, num = 3, den = 10)
      val tB = System.nanoTime()
      idx.bootstrap(docs)
      val buildS = (System.nanoTime() - tB) / 1e9
      val nCorpus = 5000L * k
      val batch = spark.range(500L).map { i =>
        val nid = nCorpus + i
        if (i % 2 == 0) { // near-dup of corpus doc i/2 (one token edited)
          val t = baseTokens(42L, i / 2).clone()
          t(0) = "edited"
          (nid, t.mkString(" "))
        } else (nid, baseTokens(4242L, i).mkString(" ")) // fresh text
      }.toDF("doc_id", "text")
      var dec: DataFrame = null
      val (rows, secs, rd, wr) = measured {
        dec = idx.dedupBatch(batch); dec.count()
      }
      val dupCorpus = dec.filter(col("status") === "dup_corpus").count()
      println(f"""{"scale":$k,"experiment":"inc_dedup","corpus":$nCorpus,""" +
        f""""bootstrap_s":$buildS%.2f,"batch_rows":$rows,""" +
        f""""batch_dedup_s":$secs%.2f,"dup_corpus":$dupCorpus,""" +
        f""""batch_shuffle_rw_mb":[${rd / 1e6}%.1f,${wr / 1e6}%.1f]}""")
    }

    val base = java.nio.file.Files.createTempDirectory("scale_evidence")
    // JIT/codegen warmup on a throwaway corpus: without it the 1× cold
    // time absorbs ~7 s of first-in-JVM compilation and the 1×/10×
    // cold ratio lies
    locally {
      val w = s"$base/warmup"
      genCorpus(spark, w, 500L, 500L, seed = 7L)
      queries.foreach { case (_, fn) => fn(spark, w).count() }
    }
    scales.foreach { k =>
      val dir = s"$base/x$k"
      genCorpus(spark, dir, 5000L * k, 2000L * k, seed = 42L)
      queries.foreach { case (name, fn) =>
        // cold carries one-time state (the IVF index build persists to
        // tmp keyed on the corpus dir); warm is the steady state
        val (rows, coldS, coldRd, coldWr) = measured(fn(spark, dir).count())
        val (_, warmS, warmRd, warmWr) = measured(fn(spark, dir).count())
        println(f"""{"scale":$k,"query":"$name","rows":$rows,""" +
          f""""cold_s":$coldS%.2f,"warm_s":$warmS%.2f,""" +
          f""""cold_shuffle_rw_mb":[${coldRd / 1e6}%.1f,${coldWr / 1e6}%.1f],""" +
          f""""warm_shuffle_rw_mb":[${warmRd / 1e6}%.1f,${warmWr / 1e6}%.1f]}""")
      }
    }
    scales.foreach(k => viewExperiment(base, k))
    scales.foreach(k => incDedupExperiment(base, k))
    scales.foreach(k => joinViewExperiment(base, k))
    spark.stop()
  }
}
