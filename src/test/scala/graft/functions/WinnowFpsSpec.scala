package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftexpr.WinnowFpsExpr

import graft.SparkSpec

/** The winnowing expression: O(n) deque result must equal the naive
  * O(n·w) definition (min of every w-hash window, distinct), and the
  * SQL-expression route must equal the direct call.
  */
class WinnowFpsSpec extends AnyFunSuite with SparkSpec {

  /** Naive reference: every window's min via brute force. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length - k + 1
    if (n < 1) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = (0 until n).map { i =>
      md.reset()
      val d = md.digest(new String(cps, i, k).getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val windows = math.max(n - w + 1, 1)
    (0 until windows).map(j => hashes.slice(j, math.min(j + w, n)).min)
      .distinct.sorted
  }

  test("deque winnow equals the naive definition on random strings") {
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abcdefgh", "abcdefghijklmnopqrstuvwxyz 0123")
    for (trial <- 0 until 200) {
      val alpha = alphabets(trial % alphabets.size)
      val len = rnd.nextInt(120)
      val s = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      val k = 1 + rnd.nextInt(6)
      val w = 1 + rnd.nextInt(10)
      val got = WinnowFpsExpr.winnow(UTF8String.fromString(s), k, w).toSeq
      assert(got === reference(s, k, w),
        s"mismatch for len=$len k=$k w=$w s='$s'")
    }
  }

  test("edge cases: empty, shorter than k, exactly one window, repeats") {
    def win(s: String, k: Int, w: Int) =
      WinnowFpsExpr.winnow(UTF8String.fromString(s), k, w).toSeq
    assert(win("", 8, 16) === Seq.empty)
    assert(win("short", 8, 16) === Seq.empty)        // < k chars
    assert(win("exactly8", 8, 16) === reference("exactly8", 8, 16)) // 1 gram
    assert(win("aaaaaaaaaaaaaaaa", 4, 4) === reference("aaaaaaaaaaaaaaaa", 4, 4))
    assert(win("aaaaaaaaaaaaaaaa", 4, 4).size === 1) // all grams equal
  }

  test("the expression matches the relational md5 chain on real rows") {
    import spark.implicits._
    val docs = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "aa bb cc dd ee ff gg hh ii jj kk ll mm nn").toDF("t")
    val viaExpr = docs.select(explode(
      WinnowFpsExpr.column(col("t"), 8, 4)).as("fp"))
      .collect().map(_.getLong(0)).toSeq.sorted
    // the SQL chain the DuckDB oracle replays
    val viaSql = docs
      .withColumn("i", explode(sequence(lit(1), length(col("t")) - 7)))
      .select(expr("cast(conv(substr(md5(substr(t, i, 8)), 1, 8), 16, 10) as bigint)").as("h"),
        col("t"), col("i"))
      .withColumn("m", min("h").over(
        org.apache.spark.sql.expressions.Window.partitionBy("t")
          .orderBy("i").rowsBetween(0, 3)))
      .filter(col("i") <= length(col("t")) - lit(7) - lit(3))
      .select("t", "m").distinct()
      .collect().map(_.getLong(1)).toSeq.sorted
    assert(viaExpr === viaSql)
  }
}
