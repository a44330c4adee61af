package org.apache.spark.sql.graftmerge

import org.scalatest.funsuite.AnyFunSuite

/** [[GraftMaintenanceSql.maskQuoted]] / [[GraftMaintenanceSql.splitTopLevel]]:
  * SQL escape forms inside quoted segments — doubled quotes (`''`) and
  * backslash escapes (`\'`) are literal CONTENT, so keyword checks and
  * splitters running on the mask must never fire inside them.
  */
class QuoteMaskSpec extends AnyFunSuite {
  import GraftMaintenanceSql.{maskQuoted, splitTopLevel}

  test("maskQuoted: plain segments masked, offsets preserved") {
    val s = "SELECT 'a,b' FROM `x JOIN y`"
    val m = maskQuoted(s)
    assert(m === "SELECT 'xxx' FROM `xxxxxxxx`")
    assert(m.length === s.length)
  }

  test("maskQuoted: doubled-quote escape stays inside the segment") {
    // '' inside a single-quoted path: the remainder (including a JOIN
    // keyword and a comma) must stay masked
    val m = maskQuoted("COPY 'it''s a JOIN, really' x")
    assert(!m.contains("JOIN") && !m.substring(5).takeWhile(_ != ' ').contains(","),
      s"escape leaked: $m")
    assert(m === "COPY 'xxxxxxxxxxxxxxxxxxxx' x")
    // doubled double-quote and doubled backtick behave the same
    assert(maskQuoted("a \"b\"\"c JOIN d\" e") === "a \"" + "x" * 11 + "\" e")
    assert(maskQuoted("a `b``c JOIN d` e") === "a `" + "x" * 11 + "` e")
  }

  test("maskQuoted: backslash escape inside string literals") {
    val m = maskQuoted("COPY 'it\\'s a JOIN b' x")
    assert(m === "COPY '" + "x" * 14 + "' x", s"backslash escape leaked: $m")
    // backtick identifiers have no backslash escapes — a backslash is
    // an ordinary masked char and the segment closes at the backtick
    assert(maskQuoted("`a\\` JOIN") === "`xx` JOIN")
  }

  test("splitTopLevel: commas inside parens, literals and escapes stay put") {
    assert(splitTopLevel("a, corr(b, c), 'x,y'") ===
      Seq("a", "corr(b, c)", "'x,y'"))
    assert(splitTopLevel("'it''s, fine', b") === Seq("'it''s, fine'", "b"))
    assert(splitTopLevel("'a\\', b', c") === Seq("'a\\', b'", "c"))
  }

  test("splitTopLevel: backticked identifiers shield commas, no backslash escape") {
    // a top-level comma inside a backticked identifier is content
    assert(splitTopLevel("`a,b`, c") === Seq("`a,b`", "c"))
    // doubled backtick is the escape for a literal backtick
    assert(splitTopLevel("`a``b, c`, d") === Seq("`a``b, c`", "d"))
    // backslash is NOT an escape inside backticks (mirrors maskQuoted):
    // `a\` closes at the second backtick
    assert(splitTopLevel("`a\\`, b") === Seq("`a\\`", "b"))
  }
}
