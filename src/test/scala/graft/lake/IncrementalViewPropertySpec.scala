package graft.lake

import java.nio.file.Files
import java.util.SplittableRandom

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property invariant for [[IncrementalView]]: whatever sequence of
  * source mutations runs, and wherever refreshes land in it, after a
  * refresh the view EQUALS the full aggregate of the source HEAD —
  * the maintenance strategy (pruned predicate, semi-join, full
  * fallback) is an implementation detail the invariant must not see.
  *
  * Ops are drawn seeded (report the seed on failure): append new
  * rows / append into existing groups / update a random key band /
  * delete a random key band / delete one whole group / compact (the
  * CDC-less rewrite that forces the full-refresh ladder) / refresh.
  * Every arc ends with a refresh + check.
  */
class IncrementalViewPropertySpec extends AnyFunSuite with SparkSpec {

  private def full(src: IncrementalTable) =
    src.snapshot().groupBy("k")
      .agg(expr("count(*)").as("cnt"), expr("sum(v)").as("total"),
        expr("max(v)").as("top"))
      .collect().map(_.toSeq).toSet

  test("view == full aggregate after every refresh, across 6 random " +
    "20-op arcs") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val r = new SplittableRandom(seed * 7919L)
      val base = Files.createTempDirectory(s"mvprop_$seed").toString
      val src = new IncrementalTable(spark, s"$base/src")
      val rows = for (k <- 0 until 30; i <- 0 until 3)
        yield (k.toLong, r.nextLong(1000).toLong)
      src.append(rows.toDF("k", "v").repartitionByRange(3, col("k")))
      val view = IncrementalView.create(spark, src, s"$base/v",
        Seq("k"), Seq("cnt" -> "count(*)", "total" -> "sum(v)",
          "top" -> "max(v)"))
      var nextK = 30L
      var checks = 0
      (1 to 20).foreach { step =>
        r.nextInt(7) match {
          case 0 => // brand-new groups
            src.append(Seq((nextK, r.nextLong(1000)),
              (nextK + 1, r.nextLong(1000))).toDF("k", "v"))
            nextK += 2
          case 1 => // grow an existing group
            src.append(Seq((r.nextLong(nextK), r.nextLong(1000)))
              .toDF("k", "v"))
          case 2 =>
            val lo = r.nextLong(nextK)
            src.updateWhere(col("k") >= lo && col("k") < lo + 3,
              Map("v" -> (col("v") + 10000L)))
          case 3 =>
            val lo = r.nextLong(nextK)
            src.deleteWhere(col("k") >= lo && col("k") < lo + 2 &&
              col("v") % 2L === 0L)
          case 4 => // a whole group vanishes
            src.deleteWhere(col("k") === r.nextLong(nextK))
          case 5 => // CDC-less rewrite: forces the full-refresh ladder
            src.compact(targetFiles = 2)
          case 6 =>
            view.refresh()
            checks += 1
            assert(view.snapshot().collect().map(_.toSeq).toSet ===
              full(src), s"seed=$seed step=$step after ${view.lastRefresh}")
        }
      }
      view.refresh()
      assert(view.snapshot().collect().map(_.toSeq).toSet === full(src),
        s"seed=$seed final after ${view.lastRefresh}")
      assert(checks >= 0) // arc completed; seed logged via assert msgs
    }
  }
}
