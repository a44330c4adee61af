package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ExactSubstr]]: exact substring removal — cut-everywhere variant,
  * overlap AND adjacency interval merge, per-doc reassembly.
  */
class ExactSubstrSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private def run(docs: Seq[(Long, String)], n: Int = 16) =
    ExactSubstr.removeRepeatedSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", n = n)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)), r.getString(6)))
      .toMap // doc -> ((n_tokens, n_hits, n_cuts, cut_tokens, kept), text)

  test("OVERLAPPING hit windows merge into one cut; a doc with no " +
    "duplicated window is untouched; a fully-shared doc empties") {
    val c = words("c", 20) // 20-token passage shared by docs 1 and 2
    val x = words("x", 10); val y = words("y", 10)
    val u = words("u", 30) // unique filler, doc 3
    val out = run(Seq(
      1L -> c.mkString(" "),                      // exactly the passage
      2L -> (x ++ c ++ y).mkString(" "),          // embedded mid-doc
      3L -> u.mkString(" ")))
    // doc 1: windows 0..4 all hit -> one cut covering all 20 tokens
    assert(out(1L)._1 === ((20L, 5L, 1L, 20L, 0L)))
    assert(out(1L)._2 === "")
    // doc 2: windows 10..14 hit -> one cut [10, 29]; x and y survive
    assert(out(2L)._1 === ((40L, 5L, 1L, 20L, 20L)))
    assert(out(2L)._2 === (x ++ y).mkString(" "))
    // doc 3: untouched, reassembly preserves every token
    assert(out(3L)._1 === ((30L, 0L, 0L, 0L, 30L)))
    assert(out(3L)._2 === u.mkString(" "))
  }

  test("ADJACENT cuts merge (gap 0) while a 1-token gap keeps them " +
    "apart — the boundary the islands condition pins") {
    val a = words("a", 16); val b = words("b", 16)
    val f = words("f", 20)
    // doc 1 = A ++ B: the 15 boundary-crossing windows exist ONLY in
    // doc 1 (doc 2 separates A from B), so its hits are exactly
    // pos 0 (=A) and pos 16 (=B) — adjacent intervals, ONE merged cut
    val out = run(Seq(
      1L -> (a ++ b).mkString(" "),
      2L -> (a ++ f ++ b).mkString(" ")))
    assert(out(1L)._1 === ((32L, 2L, 1L, 32L, 0L)),
      "adjacent [0,15] and [16,31] must merge into one cut")
    assert(out(1L)._2 === "")
    // doc 2: two separate cuts with the filler surviving between them
    assert(out(2L)._1 === ((52L, 2L, 2L, 32L, 20L)))
    assert(out(2L)._2 === f.mkString(" "))
  }

  test("minDocs honours DISTINCT documents: a window repeated twice " +
    "INSIDE one doc is not a cross-doc duplicate") {
    val p = words("p", 16); val q = words("q", 16)
    val out = run(Seq(
      1L -> (p ++ q ++ p).mkString(" "), // p twice, same doc
      2L -> words("z", 20).mkString(" ")))
    assert(out(1L)._1._3 === 0L, "intra-doc repeats alone must not cut")
    assert(out(1L)._2 === (p ++ q ++ p).mkString(" "))
  }

  test("short docs (< n tokens) pass through whole") {
    val out = run(Seq(1L -> "only five words right here now",
      2L -> "only five words right here now"))
    // identical 6-token docs: no 16-window exists, nothing cuts
    assert(out(1L)._1 === ((6L, 0L, 0L, 0L, 6L)))
    assert(out(1L)._2 === "only five words right here now")
  }
}
