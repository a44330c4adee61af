package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** BPE trainer: canonical merge-scan semantics (left-to-right
  * non-overlapping, the run-parity rule), deterministic tie-breaks,
  * hand-computed training on a tiny corpus, segmentation contract.
  */
class BpeTrainerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("merge application is the canonical left-to-right scanner: " +
    "identical-symbol runs merge at the 1st/3rd/5th… positions") {
    def app(w: String, ms: (String, String)*) =
      BpeTrainer.applyMerges(w, ms.toSeq)
    assert(app("aaaa", ("a", "a")) === Seq("aa", "aa"))
    assert(app("aaa", ("a", "a")) === Seq("aa", "a"))
    assert(app("aaaaa", ("a", "a")) === Seq("aa", "aa", "a"))
    assert(app("abab", ("a", "b")) === Seq("ab", "ab"))
    assert(app("aab", ("a", "b")) === Seq("a", "ab"))
    // rank order, not longest-first: (a,b) then (ab,c) composes
    assert(app("abc", ("a", "b"), ("ab", "c")) === Seq("abc"))
    // a merge whose pair is absent is a no-op
    assert(app("xyz", ("a", "b")) === Seq("x", "y", "z"))
  }

  test("training replays by hand on a tiny corpus; ties break " +
    "lexically on (left, right)") {
    // corpus: 'ab' x3, 'ba' x3 — pair counts: (a,b)=3, (b,a)=3 — the
    // lexical tie-break must pick (a,b) first
    val docs = Seq.fill(3)("ab ba").toDF("text")
    val ms = BpeTrainer.train(docs, "text", numMerges = 2)
    assert(ms.map(m => (m.lhs, m.rhs, m.pair_count)) ===
      Seq(("a", "b", 3L), ("b", "a", 3L)))
    assert(ms.map(_.merged) === Seq("ab", "ba"))
  }

  test("pair counts are word-frequency weighted; the alphabet is OPEN " +
    "— digits, punctuation and non-Latin tokens all train") {
    val docs = Seq("See see Bee 42 x-y").toDF("text")
    val wf = BpeTrainer.wordFrequencies(docs, "text", 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(wf === Map("see" -> 2L, "bee" -> 1L, "42" -> 1L, "x-y" -> 1L),
      "the open alphabet keeps every non-empty folded token")
    // case folding is ASCII-ONLY by contract: full Unicode lowercasing
    // diverges between engines (Greek final sigma, Turkish dotted I),
    // so non-ASCII case must pass through UNTOUCHED on both sides
    val uni = Seq("İstanbul ΟΔΟΣ Mixed")
      .toDF("text")
    val wfu = BpeTrainer.wordFrequencies(uni, "text", 100)
      .collect().map(_.getString(0)).toSet
    assert(wfu === Set("İstanbul", "ΟΔΟΣ", "mixed"),
      "non-ASCII case must survive the fold; ASCII must fold")
    // (e,e) appears once per 'see' (freq 2) and once in 'bee' (freq 1)
    // → weighted count 3, beating (s,e)=2 and (b,e)=1
    val ms = BpeTrainer.train(docs, "text", numMerges = 1)
    assert(ms.head.lhs === "e" && ms.head.rhs === "e")
    assert(ms.head.pair_count === 3L)
  }

  test("symbols are CODE POINTS: a surrogate-pair character is one " +
    "symbol, never two broken halves") {
    val emoji = new String(Character.toChars(0x1F600)) // astral plane
    assert(BpeTrainer.applyMerges(s"a${emoji}b", Nil) ===
      Seq("a", emoji, "b"))
    // and a merge against the intact symbol applies
    assert(BpeTrainer.applyMerges(s"a$emoji", Seq(("a", emoji))) ===
      Seq(s"a$emoji"))
  }

  test("fallback segmentation == vocabulary segmentation: applyMerges " +
    "on a word absent from training still replays the same scanner") {
    val docs = Seq.fill(4)("abc abd").toDF("text")
    val ms = BpeTrainer.train(docs, "text", numMerges = 1)
    val pairs = ms.map(m => (m.lhs, m.rhs))
    // 'abe' never appeared in training; the fallback path segments it
    // with the same merges a vocab entry would get
    assert(BpeTrainer.applyMerges("abe", pairs) === Seq("ab", "e"))
    assert(BpeTrainer.applyMerges("42!", pairs) === Seq("4", "2", "!"),
      "an all-novel word falls back to single-symbol pieces — zero OOV")
  }

  test("segment applies merges in rank order over the vocabulary") {
    val docs = Seq.fill(4)("abc abd").toDF("text")
    val ms = BpeTrainer.train(docs, "text", numMerges = 1)
    assert(ms.head.merged === "ab") // (a,b)=8 dominates
    val seg = BpeTrainer.segment(
      BpeTrainer.wordFrequencies(docs, "text", 100), ms)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(seg === Map("abc" -> "ab c", "abd" -> "ab d"))
  }

  test("training refuses to under-deliver merges (fixed count is the " +
    "oracle-replay contract)") {
    val docs = Seq("ab").toDF("text")
    val e = intercept[IllegalArgumentException](
      BpeTrainer.train(docs, "text", numMerges = 3))
    assert(e.getMessage.contains("exhausted"))
  }
}
