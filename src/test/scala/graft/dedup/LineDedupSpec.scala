package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LineDedup]]: corpus-wide keep-first line dedup with the
  * short-line exemption and in-order reassembly.
  */
class LineDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minChars: Int = 10) =
    LineDedup.dedupLines(docs.toDF("doc_id", "text"), minChars)
      .select("doc_id", "new_text", "lines_kept")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("keep-first across docs, order by (doc_id, pos); reassembly " +
    "preserves original line order") {
    val boiler = "accept all cookies to continue"
    val out = run(Seq(
      1L -> s"alpha unique line one\n$boiler\nalpha unique line two",
      2L -> s"$boiler\nbeta unique line",
      3L -> s"gamma unique line\n$boiler"))
    assert(out(1L) === (s"alpha unique line one\n$boiler\nalpha unique line two", 3L))
    assert(out(2L) === ("beta unique line", 1L))
    assert(out(3L) === ("gamma unique line", 1L))
  }

  test("duplicate line WITHIN one doc keeps only the earliest position") {
    val out = run(Seq(1L -> "same long line here\nmiddle text line\nsame long line here"))
    assert(out(1L) === ("same long line here\nmiddle text line", 2L))
  }

  test("short lines are exempt — never globally deduped") {
    val out = run(Seq(
      1L -> "Intro\nlong shared boilerplate line",
      2L -> "Intro\nlong shared boilerplate line\nown content of doc two"))
    assert(out(1L)._1 === "Intro\nlong shared boilerplate line")
    assert(out(2L)._1 === "Intro\nown content of doc two")
  }

  test("lines_total is the pre-dedup line count of each surviving doc") {
    val out = LineDedup.dedupLines(Seq(
      1L -> "first long shared line\nsecond long shared line",
      2L -> "first long shared line\nsecond long shared line\nown unique line here")
      .toDF("doc_id", "text"))
      .select("doc_id", "lines_total", "lines_kept")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === (2L, 2L))
    assert(out(2L) === (3L, 1L))
  }

  test("a doc whose every line was seen earlier disappears") {
    val out = run(Seq(
      1L -> "only line in the corpus",
      2L -> "only line in the corpus"))
    assert(out.keySet === Set(1L))
  }
}
