package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.IncrementalScdTable
import graft.scd.{ScdConfig, ScdTable}

/** Scaling evidence for SCALE.md: per-batch SCD maintenance cost as
  * the table grows — plain full-rewrite `ScdTable` vs manifest-backed
  * `IncrementalScdTable`. The incremental table's batch cost should
  * track the BATCH (touched buckets), not the TABLE; the plain table's
  * cost grows with the table.
  *
  * Run: sbt "runMain graft.examples.IncrementalProbe [rowsPerGrowth]"
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val growth = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)) ++
      ScdConfig.SystemCols.map(c => StructField(c,
        if (c == "record_status" || c.endsWith("_key")) StringType else TimestampType)))
    val cfg = ScdConfig(pkCols = Seq("k"), scdKeyCols = Seq("v"),
      selectCols = Some(Seq("k", "v")))
    def at(i: Int) = cfg.copy(clock =
      () => java.time.Instant.parse("2025-01-01T00:00:00Z").plusSeconds(i.toLong))

    val dir = Files.createTempDirectory("inc_probe_").toString
    val plain = new ScdTable(spark, s"$dir/plain")
    val inc = new IncrementalScdTable(spark, s"$dir/inc", numBuckets = 64)
    plain.create(schema); inc.create(schema)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // alternate: a GROWTH batch (new keys widen the table), then a
    // small UPDATE batch confined to ONE bucket — the locality real
    // incremental workloads have (a shard, a tenant, a recent range);
    // a batch of keys hashed uniformly across every bucket degrades
    // bucketing to a full rewrite by construction.
    val oneBucketKeys = spark.range(0, growth)
      .filter(pmod(hash(col("id")), lit(64)) === 3)
      .limit(100).select(col("id").as("k")).as[Long].collect()
    var clockStep = 0
    (1 to 4).foreach { round =>
      clockStep += 1
      val lo = (round - 1).toLong * growth
      val grow = spark.range(lo, lo + growth)
        .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      val s1 = at(clockStep); plain.applyScd(grow, s1); inc.applyScd(grow, s1)

      clockStep += 1
      val upd = oneBucketKeys.toSeq
        .map(k => (k, s"r$round-$k")).toDF("k", "v")
      val s2 = at(clockStep)
      val tPlain = time(plain.applyScd(upd, s2))
      val tInc = time(inc.applyScd(upd, s2))
      val total = round.toLong * growth
      println(f"[inc-probe] table=${total}%9d rows  update 1-bucket: plain=${tPlain}%6.2fs  incremental=${tInc}%6.2fs")
    }
    spark.stop()
  }
}
