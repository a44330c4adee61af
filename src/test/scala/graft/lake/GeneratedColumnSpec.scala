package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Generated columns (`GENERATED ALWAYS AS (expr)`): writes
  * materialize, reads backfill history, conflicting values are
  * rejected, UPDATEs recompute, and the derived column's footer stats
  * prune like any other.
  */
class GeneratedColumnSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("gencol_").toString + "/t"
    new IncrementalTable(spark, dir)
  }
  private def df(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "cents").coalesce(1)
  }

  test("writes materialize, history backfills, conflicts are rejected") {
    val t = fresh()
    t.append(df((1L, 1050L), (2L, 2599L))) // BEFORE the declaration
    t.addGeneratedColumn("dollars", "cents div 100")
    t.append(df((3L, 399L))) // materialized on write
    val snap = t.snapshot().orderBy("id").collect()
    assert(snap.map(_.getLong(2)).toSeq === Seq(10L, 25L, 3L),
      "old rows backfill, new rows materialize")
    // a provided-but-consistent value passes; a conflicting one fails
    import spark.implicits._
    t.append(Seq((4L, 100L, 1L)).toDF("id", "cents", "dollars"))
    assertThrows[Exception](
      t.append(Seq((5L, 100L, 9L)).toDF("id", "cents", "dollars")))
    assert(t.snapshot().count() === 4)
  }

  test("UPDATE recomputes the generated column from the new source value") {
    val t = fresh()
    t.addGeneratedColumn("dollars", "cents div 100")
    t.append(df((1L, 1050L)))
    // direct SET of the generated column is refused
    assertThrows[IllegalArgumentException](
      t.updateWhere(col("id") === 1L, Map("dollars" -> lit(99L))))
    t.updateWhere(col("id") === 1L, Map("cents" -> lit(7700L)))
    val r = t.snapshot().head
    assert(r.getLong(1) === 7700L && r.getLong(2) === 77L,
      s"generated column must track the updated source: $r")
  }

  test("rename/drop of the generated column or its source is blocked; expr must resolve") {
    val t = fresh()
    t.append(df((1L, 100L)))
    t.addGeneratedColumn("dollars", "cents div 100")
    t.append(df((2L, 200L)))
    assertThrows[IllegalArgumentException](t.renameColumn("cents", "pennies"))
    assertThrows[IllegalArgumentException](t.dropColumn("dollars"))
    assertThrows[Exception](t.addGeneratedColumn("bad", "no_such_col + 1"))
    assertThrows[IllegalArgumentException](
      t.addGeneratedColumn("dollars", "cents div 100"))
  }

  test("declaring over an existing column validates the stored data") {
    import spark.implicits._
    val t = fresh()
    // conflicting stored values: declaration is refused, so later
    // rewrites can never silently overwrite user data
    t.append(Seq((1L, 1050L, 99L)).toDF("id", "cents", "dollars"))
    assertThrows[IllegalArgumentException](
      t.addGeneratedColumn("dollars", "cents div 100"))
    // consistent stored values (or NULLs, which backfill): accepted
    val t2 = fresh()
    t2.append(Seq((1L, 1050L, 10L)).toDF("id", "cents", "dollars"))
    t2.addGeneratedColumn("dollars", "cents div 100")
    assert(t2.snapshot().head.getLong(2) === 10L)
  }

  test("stats on the materialized column prune files") {
    val t = fresh()
    t.addGeneratedColumn("bucket", "id div 100")
    (0 until 4).foreach(i =>
      t.append(df((i * 100L, 1L), (i * 100L + 50L, 2L))))
    val all = t.files(t.latestVersion.get)
    val kept = t.prunedFiles(all, Seq(col("bucket") === 2L))
    assert(kept.size === 1, s"generated-column stats should prune: $kept")
    assert(t.scan(col("bucket") === 2L).count() === 2)
  }
}
