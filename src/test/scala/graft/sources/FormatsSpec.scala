package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class FormatsSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("CSV round-trip with explicit schema and partitioned layout") {
    val dir = Files.createTempDirectory("fmt_csv").toString
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_type", "value")
    Formats.writeCsv(src, s"$dir/events_csv", partitionBy = Seq("event_type"))
    // partition pruning reaches the directory layout (assert BEFORE the
    // cache below registers — cached plans hide the FileScan)
    val plan = Formats.readCsv(spark, s"$dir/events_csv", schema)
      .filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning:\n$plan")
    // cache: corrupt-record-only pruned plans are disallowed on raw scans
    val back = Formats.clean(
      Formats.readCsv(spark, s"$dir/events_csv", schema).cache())
    assert(back.count() === src.count())
    // values survive: per-type sums match (cents precision)
    val a = src.groupBy("event_type")
      .agg(sum(expr("cast(round(value*100) as bigint)")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = back.groupBy("event_type")
      .agg(sum(expr("cast(round(value*100) as bigint)")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("JSONL round-trip preserves values; corrupt rows quarantine, not fail") {
    val dir = Files.createTempDirectory("fmt_json").toString
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_type", "value").limit(100)
    Formats.writeJsonl(src, s"$dir/ev")
    // drop in a corrupt file (a NEW file — editing an existing part
    // file in place trips Hadoop's .crc checksum sidecars)
    Files.writeString(java.nio.file.Paths.get(s"$dir/ev/zz-corrupt.json"),
      "{not valid json\n")
    val all = Formats.readJsonl(spark, s"$dir/ev", schema).cache()
    assert(Formats.clean(all).count() === 100)
    assert(Formats.quarantine(all).count() === 1)
    assert(Formats.quarantine(all).head.getAs[String](Formats.CorruptCol)
      .startsWith("{not valid"))
  }
}
