package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the current optimization round —
  * times individual pieces of a pipeline to attribute cost.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = s.stageInfo
          if (info.taskMetrics != null && info.taskMetrics.executorRunTime > 200)
            println(f"[stage] ${info.stageId}%4d run=${info.taskMetrics.executorRunTime}%6d ms " +
              f"tasks=${info.numTasks}%4d ${info.name.take(80)}")
        }
      })
    // loader-construction cost: spark.read.parquet per call
    locally {
      val dir = "/root/testdata/sf0.1"
      (1 to 30).foreach(_ => graft.Tables.load(spark, dir, "lineitem")) // JIT warm
      var t0 = System.nanoTime()
      (1 to 50).foreach(_ => graft.Tables.load(spark, dir, "lineitem"))
      println(f"[scratch] 50x warm Tables.load(lineitem) ${(System.nanoTime()-t0)/1e9}%7.3f s")
      (1 to 5).foreach(_ =>
        graft.Tables.load(spark, dir, "lineitem").filter("l_orderkey < 0").count())
      t0 = System.nanoTime()
      (1 to 20).foreach(_ =>
        graft.Tables.load(spark, dir, "lineitem").filter("l_orderkey < 0").count())
      println(f"[scratch] 20x warm load+trivial count ${(System.nanoTime()-t0)/1e9}%7.3f s")
    }
    import graft.multimodal.{AudioDedup, SignatureDedup}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val ids = spark.range(0, 750).select(col("id").as("doc_id"))
    val raw = AudioDedup.blockHashDf(
      AudioDedup.syntheticHopAudio(ids, "doc_id"),
      "doc_id", AudioDedup.OffsetBlockSamples, AudioDedup.HopSamples)
    time("blockHash count (cold, unpersisted)")(raw.count())
    time("blockHash count (again, unpersisted)")(raw.count())
    val p = raw.persist()
    time("persist materialize")(p.count())
    time("persisted count again")(p.count())
    val q = SignatureDedup.nearDupPairsBySignature(p, "doc_id", "block_idx",
      maxHamming = 3, minMatched = 2, bandBits = 16).orderBy("id_a", "id_b")
    time("sig pipeline on persisted (1st)")(q.count())
    time("sig pipeline on persisted (2nd)")(q.count())
    val q2 = SignatureDedup.nearDupPairsBySignature(raw, "doc_id", "block_idx",
      maxHamming = 3, minMatched = 2, bandBits = 16).orderBy("id_a", "id_b")
    time("sig pipeline on RAW (1st)")(q2.count())
    time("sig pipeline on RAW (2nd)")(q2.count())
    println("[scratch] units total = " + p.count())
    val bands = graft.multimodal.ImageDedup.bandExploded(
      p.select(col("doc_id"), col("block_idx"), col("h_hi"), col("h_lo")), 16)
    println("[scratch] band rows = " + bands.count())
    val buckets = bands.groupBy("band", "bv").count()
      .orderBy(desc("count")).limit(10).collect()
    buckets.foreach(r => println(s"[scratch] bucket ${r.getInt(0)}/${r.getLong(1)} size=${r.getLong(2)}"))
    val joinRows = bands.select(col("doc_id").as("ia"), col("band"), col("bv"))
      .join(bands.select(col("doc_id").as("ib"), col("band"), col("bv")),
        Seq("band", "bv"))
      .filter(col("ia") < col("ib"))
    println("[scratch] join rows (ia<ib) = " + joinRows.count())
    // calibration: a trivial warm 32-task shuffle in the same session
    val triv = spark.range(0, 1000000).withColumn("k", col("id") % 100)
      .groupBy("k").agg(sum("id").as("s"), count(lit(1)).as("c"))
    time("trivial shuffle (1st)")(triv.count())
    time("trivial shuffle (2nd)")(triv.count())
    time("trivial shuffle (3rd)")(triv.count())
    spark.stop()
  }
}
