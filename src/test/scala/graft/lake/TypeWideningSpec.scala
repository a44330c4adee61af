package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Lossless type widening (int → long, float → double — Delta's
  * type-widening feature): a wide batch commits without rewriting the
  * table, old narrow files upcast at scan, time travel keeps each
  * version's own width, stats skipping survives the mixed-width store,
  * and a widened column's bloom index is retired in the same commit
  * (its filters hashed the narrow values — a wide probe would wrongly
  * prune).
  */
class TypeWideningSpec extends AnyFunSuite with SparkSpec {

  private def mkDir(tag: String) =
    Files.createTempDirectory(s"widen_${tag}_").toString + "/t"

  test("int->long widening: wide batch commits, narrow files upcast at read") {
    import spark.implicits._
    val dir = mkDir("il")
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))      // k: int
    assert(t.tableSchema.get("k").dataType === IntegerType)
    val v0 = t.latestVersion.get
    t.append(Seq((3L, "c"), (1L << 40, "d")).toDF("k", "v")) // k: long
    assert(t.tableSchema.get("k").dataType === LongType)
    val rows = t.snapshot().select("k", "v").as[(Long, String)].collect().toMap
    assert(rows === Map(1L -> "a", 2L -> "b", 3L -> "c", (1L << 40) -> "d"))
    // a narrow batch into the widened table stays committable and the
    // table schema stays wide
    t.append(Seq((5, "e")).toDF("k", "v"))
    assert(t.tableSchema.get("k").dataType === LongType)
    assert(t.snapshot().count() === 5)
    // time travel: the pre-widening version keeps its own narrow width
    assert(t.schemaAt(v0).get("k").dataType === IntegerType)
    assert(t.snapshotAt(v0).schema("k").dataType === IntegerType)
    assert(t.snapshotAt(v0).count() === 2)
    // post-widening versions read their mixed-width file sets
    assert(t.snapshotAt(t.latestVersion.get).schema("k").dataType === LongType)
  }

  test("float->double widening; lossy changes still refused") {
    import spark.implicits._
    val dir = mkDir("fd")
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((1.5f, "a")).toDF("x", "v"))
    t.append(Seq((2.25d, "b")).toDF("x", "v"))
    assert(t.tableSchema.get("x").dataType === DoubleType)
    assert(t.snapshot().select("x").as[Double].collect().toSet === Set(1.5d, 2.25d))
    // long -> int (narrowing) and string -> int are NOT widenings
    val e = intercept[IllegalArgumentException] {
      t.append(Seq(("oops", "c")).toDF("x", "v"))
    }
    assert(e.getMessage.contains("incompatible schema change"))
  }

  test("stats skipping survives a widening (mixed-width stats store)") {
    import spark.implicits._
    val dir = mkDir("st")
    val t = new IncrementalTable(spark, dir)
    // two narrow files with disjoint ranges, then a widening append
    t.append(Seq.tabulate(100)(i => (i, "lo")).toDF("k", "v").coalesce(1))
    t.append(Seq.tabulate(100)(i => (1000 + i, "mid")).toDF("k", "v").coalesce(1))
    t.append(Seq((1L << 40, "hi")).toDF("k", "v").coalesce(1))
    val all = t.files(t.latestVersion.get)
    // pruning still engages across int- and long-typed stats rows
    val pruned = t.prunedFiles(all, Seq(col("k") >= (1L << 40)))
    assert(pruned.size < all.size,
      s"stats pruning dead after widening: kept ${pruned.size} of ${all.size}")
    assert(t.scan(col("k") >= (1L << 40)).count() === 1)
    assert(t.scan(col("k") < 100).count() === 100)
    assert(t.scan(col("k") >= 1000 && col("k") < 1100).count() === 100)
  }

  test("widening a bloom-indexed column retires it from the bloom config") {
    import spark.implicits._
    val dir = mkDir("bl")
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.setBloomColumns("k", "v")
    t.append(Seq.tabulate(50)(i => (10 + i, s"r$i")).toDF("k", "v").coalesce(1))
    assert(t.bloomColumns.toSet === Set("k", "v"))
    t.append(Seq((1L << 40, "wide")).toDF("k", "v"))
    // k's filters hashed INT values — a LONG probe would miss and
    // wrongly prune, so the widening commit retires k (v survives)
    assert(t.bloomColumns.toSet === Set("v"),
      s"widened column must leave the bloom config: ${t.bloomColumns}")
    // correctness: the point lookup still finds its row
    assert(t.scan(col("k") === 15L).count() === 1)
    assert(t.scan(col("k") === (1L << 40)).count() === 1)
  }
}
