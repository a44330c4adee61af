package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Randomized DML equivalence: for ANY predicate from the grammar,
  * DELETE must leave exactly the rows where the predicate is not TRUE
  * (SQL truth table — NULL keeps the row), whether executed copy-on-
  * write or as deletion vectors, and the CDC sidecar must carry
  * exactly the deleted rows. The worst DML failure modes — dropping a
  * row the predicate didn't match (stats pruning too eager), keeping a
  * row it did (survivor filter inverted), resurrecting a DV-deleted
  * row through a rewrite — all surface here as set differences.
  */
class DmlPropertySpec extends AnyFunSuite with SparkSpec {

  private val rng = new scala.util.Random(4242)

  private def buildRows(): Seq[(Long, java.lang.Long, String)] =
    (0L until 500L).map { i =>
      val v: java.lang.Long =
        if (rng.nextInt(10) == 0) null else (rng.nextInt(100).toLong: java.lang.Long)
      (i, v, s"k${rng.nextInt(40)}")
    }

  private def buildTable(rows: Seq[(Long, java.lang.Long, String)]): IncrementalTable = {
    import spark.implicits._
    val dir = Files.createTempDirectory("dml_prop_").toString + "/t"
    val t = new IncrementalTable(spark, dir)
    rows.grouped(125).foreach(g => t.append(g.toDF("id", "v", "s").coalesce(1)))
    t
  }

  private def randomLeaf(): Column = rng.nextInt(8) match {
    case 0 => col("id") === lit(rng.nextLong(520))
    case 1 => col("id") > lit(rng.nextLong(520))
    case 2 => col("id") <= lit(rng.nextLong(520))
    case 3 => col("v") === lit(rng.nextLong(110))
    case 4 => col("v") < lit(rng.nextLong(110))
    case 5 => col("v").isNull
    case 6 => col("s") === lit(s"k${rng.nextInt(45)}")
    case 7 => col("s") > lit(s"k${rng.nextInt(45)}")
  }

  private def randomPred(depth: Int = 2): Column =
    if (depth == 0 || rng.nextInt(3) == 0) randomLeaf()
    else if (rng.nextBoolean()) randomPred(depth - 1) && randomPred(depth - 1)
    else randomPred(depth - 1) || randomPred(depth - 1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("15 random predicates: CoW and DV deletes both equal the filter complement") {
    (1 to 15).foreach { i =>
      val rows = buildRows()
      val pred = randomPred()
      val t = buildTable(rows)
      val full = t.snapshot().cache()
      val expectSurvivors = ids(full.filter(not(coalesce(pred, lit(false)))))
      val expectDeleted = ids(full.filter(coalesce(pred, lit(false))))
      full.unpersist()

      // copy-on-write on one table...
      val vCow = t.deleteWhere(pred)
      assert(ids(t.snapshot()) === expectSurvivors, s"CoW survivors differ, round $i pred=$pred")
      if (expectDeleted.nonEmpty) {
        assert(ids(t.changes(vCow - 1, vCow).filter(col("_change_type") === "delete"))
          === expectDeleted, s"CoW CDC differs, round $i")
      }

      // ...deletion vectors on an identical twin
      val t2 = buildTable(rows)
      t2.deleteVector(pred)
      assert(ids(t2.snapshot()) === expectSurvivors, s"DV survivors differ, round $i pred=$pred")
      // stats-pruned scans agree with the post-delete state too
      val probe = col("id") <= lit(260L)
      assert(ids(t2.scan(probe)) === expectSurvivors.filter(_ <= 260L),
        s"DV pruned scan differs, round $i")
      // a compact materializes the vectors without changing state
      t2.compact(2)
      assert(ids(t2.snapshot()) === expectSurvivors, s"post-compact state differs, round $i")
    }
  }
}
