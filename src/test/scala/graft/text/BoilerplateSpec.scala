package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** C4-style boilerplate stripping: domain-scoped frequency rule,
  * exact integer threshold, blank-line immunity, reconstruction order.
  */
class BoilerplateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def doc(id: Long, dom: String, lines: String*) =
    (id, dom, lines.mkString("\n"))

  test("recurring domain chrome strips; rare lines survive; scope is " +
    "PER DOMAIN; blank lines are immune; order is preserved") {
    val docs = Seq(
      doc(1, "a", "MENU", "alpha body", "", "footer (c)"),
      doc(2, "a", "MENU", "beta body", "footer (c)"),
      doc(3, "a", "MENU", "gamma body", "footer (c)"),
      doc(4, "a", "MENU", "delta body", "footer (c)"),
      // domain b: "MENU" appears in only ONE of its three docs — kept
      doc(5, "b", "MENU", "epsilon body"),
      doc(6, "b", "zeta body"),
      doc(7, "b", "eta body")
    ).toDF("doc_id", "dom", "text")
    val out = Boilerplate.strip(docs, "doc_id", "text", "dom",
      minDocFracBp = 5000, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: MENU + footer stripped, blank line KEPT
    assert(out(0) === ((1L, 4L, 2L, "alpha body\n")))
    assert(out(1) === ((2L, 3L, 1L, "beta body")))
    // domain b keeps its once-off MENU (below minDocs AND below frac)
    assert(out(4) === ((5L, 2L, 2L, "MENU\nepsilon body")))
    assert(out(5) === ((6L, 1L, 1L, "zeta body")))
  }

  test("trimmed-key matching: space-padded variants of a boilerplate " +
    "line strip together (SPACE-only trim — SQL trim() parity; tabs " +
    "are content); a fully-stripped doc yields empty text") {
    val docs = Seq(
      doc(1, "a", "  nav  ", "one"),
      doc(2, "a", "nav", "two"),
      doc(3, "a", " nav", "three"),
      doc(4, "a", "nav") // nothing but chrome
    ).toDF("doc_id", "dom", "text")
    val out = Boilerplate.strip(docs, "doc_id", "text", "dom",
      minDocFracBp = 5000, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 1L, "one")))
    assert(out(1) === ((2L, 1L, "two")))
    assert(out(2) === ((3L, 1L, "three")))
    assert(out(3) === ((4L, 0L, "")))
  }

  test("the integer threshold sits exactly on the boundary: nd*10000 " +
    ">= dd*bp keeps/strips deterministically") {
    // 4 docs in the domain, line in exactly 2 → 2*10000 >= 4*5000 (==)
    // strips at bp=5000, survives at bp=5001
    val docs = Seq(
      doc(1, "a", "edge line", "x1"),
      doc(2, "a", "edge line", "x2"),
      doc(3, "a", "x3"),
      doc(4, "a", "x4")
    ).toDF("doc_id", "dom", "text")
    val at5000 = Boilerplate.strip(docs, "doc_id", "text", "dom",
      minDocFracBp = 5000, minDocs = 2)
      .filter(col("doc_id") === 1).head().getString(3)
    val at5001 = Boilerplate.strip(docs, "doc_id", "text", "dom",
      minDocFracBp = 5001, minDocs = 2)
      .filter(col("doc_id") === 1).head().getString(3)
    assert(at5000 === "x1", "== boundary must strip")
    assert(at5001 === "edge line\nx1", "one bp past must keep")
  }
}
