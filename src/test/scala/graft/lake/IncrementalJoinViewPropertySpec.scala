package graft.lake

import java.nio.file.Files
import java.util.SplittableRandom

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property invariant for [[IncrementalJoinView]]: whatever sequence
  * of fact/dim mutations runs, after a refresh the view EQUALS the
  * full `fact ⋈ dim GROUP BY` aggregate of both HEADs — signed-delta
  * merge, key-pruned rewrite, dim-change full fallback and
  * datachange-skip are implementation details the invariant must not
  * see. NULL sum inputs are injected throughout so the accumulator +
  * non-null-counter representation is stressed on every arc. The view
  * also carries `max(v)`/`min(v)` (round 9), so every random arc
  * exercises the HYBRID extreme path too: band updates mint new maxes
  * (covered merges), band deletes and join-key re-homing remove group
  * extremes (affected-group recomputes), and the invariant cannot
  * tell which strategy ran.
  */
class IncrementalJoinViewPropertySpec extends AnyFunSuite with SparkSpec {

  private def full(fact: IncrementalTable, dim: IncrementalTable) =
    fact.snapshot().join(dim.snapshot(), col("ck") === col("dk"))
      .groupBy("nation")
      .agg(expr("count(*)").as("cnt"), expr("sum(v)").as("sv"),
        expr("max(v)").as("mx"), expr("min(v)").as("mn"))
      .collect().map(_.toSeq).toSet

  test("join view == full join aggregate after every refresh, across " +
    "6 random 20-op arcs") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val r = new SplittableRandom(seed * 104729L)
      val base = Files.createTempDirectory(s"jvprop_$seed").toString
      val fact = new IncrementalTable(spark, s"$base/fact")
      val dim = new IncrementalTable(spark, s"$base/dim")
      dim.append((0 until 10).map(d => (d.toLong, s"n${d % 3}"))
        .toDF("dk", "nation").coalesce(1))
      def v(): Option[Long] = // ~1 in 4 NULL: stress the nn counters
        if (r.nextInt(4) == 0) None else Some(r.nextLong(1000))
      val rows = for (i <- 0 until 60)
        yield (i.toLong, r.nextLong(10), v())
      fact.append(rows.toDF("fk", "ck", "v")
        .repartitionByRange(3, col("fk")))
      val view = IncrementalJoinView.create(spark, fact,
        Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
        Seq("nation"), Seq("cnt" -> "count(*)", "sv" -> "sum(v)",
          "mx" -> "max(v)", "mn" -> "min(v)"))
      var nextF = 60L
      (1 to 20).foreach { step =>
        r.nextInt(7) match {
          case 0 => // new fact rows, random dims
            fact.append(Seq((nextF, r.nextLong(10), v()),
              (nextF + 1, r.nextLong(10), v())).toDF("fk", "ck", "v"))
            nextF += 2
          case 1 => // update a value band (pre/post images)
            val lo = r.nextLong(nextF)
            fact.updateWhere(col("fk") >= lo && col("fk") < lo + 4,
              Map("v" -> (coalesce(col("v"), lit(0L)) + 10000L)))
          case 2 => // re-home a band to a different dim (join key moves)
            val lo = r.nextLong(nextF)
            fact.updateWhere(col("fk") >= lo && col("fk") < lo + 3,
              Map("ck" -> lit(r.nextLong(10))))
          case 3 =>
            val lo = r.nextLong(nextF)
            fact.deleteWhere(col("fk") >= lo && col("fk") < lo + 3)
          case 4 => // datachange=false rewrite: delta refresh survives it
            fact.compact(targetFiles = 2)
          case 5 => // dim mutation: next refresh must go full
            dim.updateWhere(col("dk") === r.nextLong(10),
              Map("nation" -> lit(s"n${r.nextInt(4)}")))
          case 6 =>
            view.refresh()
            assert(view.snapshot().collect().map(_.toSeq).toSet ===
              full(fact, dim),
              s"seed=$seed step=$step after ${view.lastRefresh}")
        }
      }
      view.refresh()
      assert(view.snapshot().collect().map(_.toSeq).toSet ===
        full(fact, dim), s"seed=$seed final after ${view.lastRefresh}")
    }
  }
}
