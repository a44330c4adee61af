package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Randomized equivalence: for ANY predicate from the grammar the
  * stats-pruned scan must return exactly the rows of the unpruned
  * filter — pruning may only ever remove files that provably cannot
  * match. A violation here is the worst failure mode of data skipping
  * (silently dropped rows), so it gets a property harness, not just
  * examples.
  */
class FileStatsPropertySpec extends AnyFunSuite with SparkSpec {

  private val rng = new scala.util.Random(42)

  /** A table of (id LONG, v LONG nullable, s STRING) in several
    * randomly-sliced files, some slices sorted (tight bounds), some
    * interleaved (wide bounds), some holding NULL runs.
    */
  private def buildTable(): IncrementalTable = {
    import spark.implicits._
    val dir = Files.createTempDirectory("fstats_prop_").toString + "/t"
    val t = new IncrementalTable(spark, dir)
    val rows = (0L until 600L).map { i =>
      val v: java.lang.Long = if (rng.nextInt(10) == 0) null else (rng.nextInt(100).toLong: java.lang.Long)
      (i, v, s"k${rng.nextInt(50)}")
    }
    // 6 files: 3 contiguous id slices, 2 interleaved, 1 all-null v
    rows.grouped(150).zipWithIndex.foreach { case (g, _) =>
      t.append(g.toDF("id", "v", "s").coalesce(1))
    }
    t.append(rows.filter(_._1 % 3 == 0).take(50).toDF("id", "v", "s").coalesce(1))
    t.append(rows.filter(_._1 % 3 == 1).take(50).toDF("id", "v", "s").coalesce(1))
    t.append((900L until 930L).map(i => (i, null: java.lang.Long, s"n$i"))
      .toDF("id", "v", "s").coalesce(1))
    t
  }

  private def randomLeaf(): Column = rng.nextInt(9) match {
    case 0 => col("id") === lit(rng.nextLong(950))
    case 1 => col("id") > lit(rng.nextLong(950))
    case 2 => col("id") <= lit(rng.nextLong(950))
    case 3 => col("v") === lit(rng.nextLong(110))
    case 4 => col("v") < lit(rng.nextLong(110))
    case 5 => col("v").isNull
    case 6 => col("s") === lit(s"k${rng.nextInt(60)}")
    case 7 => col("s") >= lit(s"k${rng.nextInt(60)}")
    case 8 => col("id").isin((0 until 3).map(_ => rng.nextLong(950)): _*)
  }

  private def randomPred(depth: Int): Column =
    if (depth == 0) randomLeaf()
    else rng.nextInt(3) match {
      case 0 => randomPred(depth - 1) && randomPred(depth - 1)
      case 1 => randomPred(depth - 1) || randomPred(depth - 1)
      case 2 => randomLeaf()
    }

  test("40 random predicates: pruned scan ≡ unpruned filter") {
    val t = buildTable()
    val all = t.files(t.latestVersion.get)
    var prunedSomething = 0
    (1 to 40).foreach { i =>
      val pred = randomPred(2)
      val expected = t.snapshot().filter(pred)
        .select("id", "v", "s").collect().map(_.toString).sorted.toSeq
      val got = t.scan(pred)
        .select("id", "v", "s").collect().map(_.toString).sorted.toSeq
      assert(got === expected, s"case $i predicate $pred dropped rows")
      if (t.prunedFiles(all, Seq(pred)).size < all.size) prunedSomething += 1
    }
    // the harness must actually exercise pruning, not vacuously pass
    assert(prunedSomething > 5, s"only $prunedSomething/40 cases pruned")
  }

  test("z-ordered layout: 25 random predicates still scan ≡ filter, and prune") {
    val t = buildTable()
    // rewrite the whole table Morton-clustered on (id, v) — the
    // equivalence property must survive the layout change, and both
    // columns should now prune regularly
    t.clusterZ(8, 5, "id", "v")
    val all = t.files(t.latestVersion.get)
    var prunedSomething = 0
    (1 to 25).foreach { i =>
      val pred = randomPred(2)
      val expected = t.snapshot().filter(pred)
        .select("id", "v", "s").collect().map(_.toString).sorted.toSeq
      val got = t.scan(pred)
        .select("id", "v", "s").collect().map(_.toString).sorted.toSeq
      assert(got === expected, s"z-case $i predicate $pred dropped rows")
      if (t.prunedFiles(all, Seq(pred)).size < all.size) prunedSomething += 1
    }
    assert(prunedSomething > 5, s"only $prunedSomething/25 z-cases pruned")
  }
}
