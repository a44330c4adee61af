package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.lake.Expectations.{Drop, Fail, Rule, Warn}

/** DLT-style expectations on the lake write path
  * ([[Expectations.appendWithExpectations]]): warn counts, drop
  * quarantines with rule tags, fail aborts atomically, metrics ride
  * the commit meta, and the append keeps the full materialization
  * pipeline (identity/row-id allocation).
  */
class ExpectationsSpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String): IncrementalTable =
    new IncrementalTable(spark,
      Files.createTempDirectory(s"exp_$tag").toString + "/t")

  private def df(rows: (Long, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "score").coalesce(1)
  }

  test("drop quarantines tagged rows; warn only counts; meta records both") {
    val t = fresh("d")
    val q = fresh("dq")
    val res = Expectations.appendWithExpectations(t,
      df((1L, 5.0), (2L, -1.0), (3L, 0.5), (4L, -9.0)),
      Seq(
        Rule("pos", "score > 0", Drop),
        Rule("big", "score >= 1", Warn)),
      quarantine = Some(q), batchTag = "day1")
    assert(res.admitted === 2L && res.quarantined === 2L)
    assert(res.violations === Map("pos" -> 2L, "big" -> 3L))
    assert(t.snapshot().select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))
    val quar = q.snapshot()
      .select("id", "_failed_rules", "_quarantined_batch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(quar === Set((2L, "pos", "day1"), (4L, "pos", "day1")))
    // metrics read back from the commit meta, versioned with the data
    assert(Expectations.metricsAt(t, res.version) ===
      Map("pos" -> 2L, "big" -> 3L))
    assert(t.operationAt(res.version) === "append[expectations]")
  }

  test("crash between quarantine and target append: the re-run admits " +
    "every kept row exactly once, never a dropped one, and the TAGGED " +
    "quarantine slice is replaced — exactly-once on both sides") {
    val t = fresh("cr")
    val q = fresh("crq")
    val batch = df((1L, 5.0), (2L, -1.0), (3L, 0.5), (4L, -9.0))
    val rules = Seq(Rule("pos", "score > 0", Drop))
    // induce the crash INSIDE the window: the quarantine append is a
    // plain append (commits), then the target append aborts on a
    // temporary CHECK constraint every kept row violates — exactly a
    // process death between the two commits
    t.append(df((99L, 1.0)).limit(0)) // materialize schema for the constraint
    t.addConstraint("crash", "score < -1000")
    intercept[Exception] {
      Expectations.appendWithExpectations(t, batch, rules,
        quarantine = Some(q), batchTag = "b0")
    }
    // the torn state: quarantine committed, target did not admit
    assert(q.snapshot().count() === 2L)
    assert(t.snapshot().count() === 0L)
    // operator re-runs the SAME batch after the crash
    t.dropConstraint("crash")
    val res = Expectations.appendWithExpectations(t, batch, rules,
      quarantine = Some(q), batchTag = "b0")
    assert(res.admitted === 2L && res.quarantined === 2L)
    // contract: kept rows exactly once, dropped rows NEVER admitted
    assert(t.snapshot().select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))
    assert(t.snapshot().count() === 2L, "no duplicate admissions")
    // exactly-once quarantine: the replay atomically REPLACED the b0
    // slice, so one copy of each bad row — not one per attempt
    val quar = q.snapshot().select("id", "_quarantined_batch").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(quar.toSet === Set((2L, "b0"), (4L, "b0")))
    assert(quar.length === 2,
      "replay must replace the tagged slice, not stack a copy per attempt")
    assert(quar.toSet.map((p: (Long, String)) => p._1)
      .intersect(Set(1L, 3L)).isEmpty, "no admitted row ever quarantined")

    // a DIFFERENT tag accumulates alongside, untouched by b0 replays
    val res2 = Expectations.appendWithExpectations(t, df((5L, -2.0)),
      rules, quarantine = Some(q), batchTag = "b1")
    assert(res2.admitted === 0L && res2.quarantined === 1L)
    assert(q.snapshot().select("id", "_quarantined_batch").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((2L, "b0"), (4L, "b0"), (5L, "b1")))

    // a CORRECTED re-run of b1 (no violations) clears b1's stale
    // slice — a row must never read as both admitted and quarantined
    val res3 = Expectations.appendWithExpectations(t, df((5L, 2.0)),
      rules, quarantine = Some(q), batchTag = "b1")
    assert(res3.admitted === 1L && res3.quarantined === 0L)
    assert(q.snapshot().select("id", "_quarantined_batch").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((2L, "b0"), (4L, "b0")))
    assert(t.snapshot().select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L, 5L))
  }

  test("fail aborts the whole batch atomically — neither table commits") {
    val t = fresh("f")
    val q = fresh("fq")
    val e = intercept[IllegalStateException] {
      Expectations.appendWithExpectations(t,
        df((1L, 5.0), (2L, -1.0)),
        Seq(
          Rule("pos", "score > 0", Fail),
          Rule("any", "score > -100", Drop)),
        quarantine = Some(q))
    }
    assert(e.getMessage.contains("pos") && e.getMessage.contains("1 row"))
    assert(!t.exists && !q.exists)
  }

  test("NULL passes (CHECK semantics); multiple drop rules comma-tag") {
    import spark.implicits._
    val t = fresh("n")
    val q = fresh("nq")
    val batch = Seq(
      (1L, Some(5.0), "ok"),
      (2L, None: Option[Double], "ok"), // NULL score passes both
      (3L, Some(-1.0), "")) // fails both drop rules
      .toDF("id", "score", "tag").coalesce(1)
    val res = Expectations.appendWithExpectations(t, batch,
      Seq(
        Rule("pos", "score > 0", Drop),
        Rule("tagged", "length(tag) > 0", Drop)),
      quarantine = Some(q))
    assert(res.admitted === 2L && res.quarantined === 1L)
    val tags = q.snapshot().select("_failed_rules").head.getString(0)
    assert(tags === "pos,tagged")
  }

  test("the gated append still allocates row ids") {
    val t = fresh("r")
    val q = fresh("rq")
    t.append(df((1L, 1.0)))
    t.enableRowTracking()
    Expectations.appendWithExpectations(t, df((2L, 2.0), (3L, -3.0)),
      Seq(Rule("pos", "score > 0", Drop)), quarantine = Some(q))
    val ids = t.snapshot().select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.keySet === Set(1L, 2L))
    assert(ids(2L) > ids(1L), "the admitted row allocated a fresh id")
  }

  test("an all-dropped batch commits nothing to the target") {
    val t = fresh("z")
    val q = fresh("zq")
    t.append(df((1L, 1.0)))
    val v0 = t.latestVersion.get
    val res = Expectations.appendWithExpectations(t, df((2L, -2.0)),
      Seq(Rule("pos", "score > 0", Drop)), quarantine = Some(q))
    assert(res.version === -1L && res.admitted === 0L)
    assert(t.latestVersion === Some(v0))
    assert(q.snapshot().count() === 1L)
  }
}
