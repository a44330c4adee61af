package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CHECK constraints on the incremental format: validated against
  * existing rows when added, enforced on every data-introducing write,
  * NULL passes (SQL standard), carried across appends / rewrites /
  * restores like the table property they are.
  */
class ConstraintSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("constraint_").toString + "/t"
    new IncrementalTable(spark, dir)
  }
  private def df(rows: (Long, java.lang.Long)*) = {
    import spark.implicits._
    rows.toDF("id", "score").coalesce(1)
  }

  test("constraint gates appends; NULL passes; drop lifts the gate") {
    val t = fresh()
    t.append(df((1L, 10L), (2L, 20L)))
    t.addConstraint("positive_score", "score > 0")
    assert(t.constraints === Map("positive_score" -> "score > 0"))

    // violating append rejected BEFORE any commit
    val head = t.latestVersion.get
    val err = intercept[IllegalStateException](t.append(df((3L, -5L))))
    assert(err.getMessage.contains("positive_score"))
    assert(t.latestVersion === Some(head)) // nothing committed

    t.append(df((3L, 30L), (4L, null))) // NULL passes (SQL standard)
    assert(t.snapshot().count() === 4L)
    // the constraint carried across the append
    assert(t.constraints.contains("positive_score"))

    t.dropConstraint("positive_score")
    t.append(df((5L, -1L))) // gate lifted
    assert(t.snapshot().count() === 5L)
  }

  test("adding a constraint over violating data is rejected") {
    val t = fresh()
    t.append(df((1L, -3L)))
    val err = intercept[IllegalStateException](
      t.addConstraint("positive_score", "score > 0"))
    assert(err.getMessage.contains("existing rows violate"))
    assert(t.constraints.isEmpty)
  }

  test("constraints survive overwrite, compact, DV delete, and restore") {
    val t = fresh()
    t.append(df((1L, 10L)))
    t.addConstraint("positive_score", "score > 0")
    // overwrite with valid data keeps the constraint in force
    t.writeSnapshot(df((7L, 70L)), operation = "overwrite")
    assert(t.constraints.contains("positive_score"))
    // overwrite with INVALID data is rejected
    assertThrows[IllegalStateException](
      t.writeSnapshot(df((8L, -1L)), operation = "overwrite"))
    t.append(df((8L, 80L), (9L, 90L)))
    t.compact(1)
    assert(t.constraints.contains("positive_score"))
    t.deleteVector(col("id") === 7L)
    assert(t.constraints.contains("positive_score"))
    val pre = t.latestVersion.get
    t.restore(pre - 2) // data rewinds; the constraint (a property) stays
    assert(t.constraints.contains("positive_score"))
    assertThrows[IllegalStateException](t.append(df((10L, -10L))))
  }

  test("UPDATE postimages are validated") {
    val t = fresh()
    t.append(df((1L, 10L), (2L, 20L)))
    t.addConstraint("positive_score", "score > 0")
    assertThrows[IllegalStateException](
      t.updateWhere(col("id") === 1L, Map("score" -> lit(-99L))))
    // table unchanged
    assert(t.snapshot().filter(col("score") < 0).count() === 0L)
    t.updateWhere(col("id") === 1L, Map("score" -> lit(99L)))
    assert(t.snapshot().filter(col("score") === 99L).count() === 1L)
  }

  test("SQL surface: ADD/DROP CONSTRAINT through the catalog") {
    val wh = Files.createTempDirectory("constraint_wh_").toString
    spark.conf.set("spark.sql.catalog.cons", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cons.warehouse", wh)
    val t = new IncrementalTable(spark, s"$wh/t")
    t.append(df((1L, 5L)))
    spark.sql("ALTER TABLE cons.t ADD CONSTRAINT pos CHECK (score > 0)")
    assert(t.constraints === Map("pos" -> "score > 0"))
    val err = intercept[Exception](
      spark.sql("INSERT INTO cons.t VALUES (2, -1)"))
    assert(err.getMessage.contains("pos") ||
      Option(err.getCause).exists(_.getMessage.contains("pos")))
    spark.sql("ALTER TABLE cons.t DROP CONSTRAINT pos")
    spark.sql("INSERT INTO cons.t VALUES (2, -1)")
    assert(t.snapshot().count() === 2L)
  }
}
