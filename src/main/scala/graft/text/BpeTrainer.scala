package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding VOCABULARY TRAINER (Sennrich et al. 2016's
  * published algorithm, word-frequency formulation) — the tokenizer
  * primitive the text pipeline was missing: chunking/packing/counting
  * all tokenize on whitespace, but a trained subword vocabulary is
  * what an LLM data platform actually ships.
  *
  * Shape mirrors [[graft.sim.IvfAnn]]'s training contract, because the
  * scale argument is the same: the model (a merge list) is driver-
  * sized, so training must cost ONE corpus pass plus iterations over a
  * BOUNDED table — never iterations over the corpus.
  *
  *  - One corpus pass builds the word-frequency table (split on
  *    whitespace → lower() → groupBy word; ANY non-empty token is a
  *    word — digits, punctuation and non-Latin text all train, the
  *    round-13 `^[a-z]+$` alphabet silently dropped them), capped at
  *    the `maxVocabWords` most frequent words (ties broken lexically) —
  *    Zipf makes the cap lossless for pair statistics long before it
  *    binds, and it bounds every later pass by V, not corpus bytes.
  *  - Each merge round re-derives symbol sequences by applying the
  *    merges learned so far (a row-local map — the fold is sequential
  *    per word, the textbook `mapPartitions`-class seam), counts
  *    adjacent pairs weighted by word frequency (explode + one
  *    partial-aggregated groupBy over ≤V words), and collects exactly
  *    ONE row: the most frequent pair, ties broken lexically on
  *    (left, right) so the training replays bit-for-bit in the DuckDB
  *    oracle's stacked CTE iterations.
  *  - Merge application is the CANONICAL left-to-right non-overlapping
  *    scan (a run `aaaa` under merge (a,a) becomes `[aa][aa]`), which
  *    the oracle reproduces with an islands-parity window — overlap
  *    chains only form on identical-symbol runs, where the 1st, 3rd,
  *    5th… match of each run is the one the scanner takes.
  *
  * Tokenizing a corpus with the trained vocabulary ([[segment]]) is a
  * pure narrow map with the merge list broadcast in the closure — zero
  * shuffle at any scale. No end-of-word marker is used (the GPT-2
  * style choice, minus the byte alphabet); the alphabet is OPEN — the
  * corpus' own lowercased code points, whatever they are — so every
  * word segments to single-character symbols at worst and tokenization
  * is zero-OOV by construction.
  */
object BpeTrainer {

  /** One learned merge: rank (1-based order), the two joined symbols,
    * their concatenation, and the weighted pair count that won.
    */
  final case class Merge(merge_rank: Long, lhs: String, rhs: String,
      merged: String, pair_count: Long)

  private val AsciiUpper = ('A' to 'Z').mkString
  private val AsciiLower = ('a' to 'z').mkString

  /** ASCII-ONLY case fold — the engine-portable contract. Full Unicode
    * lowercasing DIVERGES between engines (java.lang.String applies
    * conditional/full mappings — Greek final sigma, Turkish dotted I
    * expanding to i+U+0307 — while DuckDB's utf8proc does simple
    * per-codepoint maps), so an open-alphabet trainer that lower()ed
    * everything would train DIFFERENT words per engine on Greek or
    * Turkish text and desync the bit-for-bit oracle. Folding [A-Z]
    * only is deterministic everywhere; other scripts keep their case
    * (two case variants train as two words — a documented contract,
    * not a silent divergence).
    */
  def asciiLower(c: Column): Column = translate(c, AsciiUpper, AsciiLower)

  /** [[asciiLower]] as DuckDB SQL over the given expression. */
  def asciiLowerSql(expr: String): String =
    s"translate($expr, '$AsciiUpper', '$AsciiLower')"

  /** The bounded training table: `(word, freq)` for the
    * `maxVocabWords` most frequent whitespace tokens (ASCII-folded,
    * any non-empty token — the open alphabet).
    */
  def wordFrequencies(docs: DataFrame, textCol: String,
      maxVocabWords: Int): DataFrame =
    docs.select(explode(split(asciiLower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("word")).limit(maxVocabWords)

  /** Train `numMerges` merges; returns them as a DataFrame
    * `(merge_rank, lhs, rhs, merged, pair_count)` ordered by rank.
    * Throws if the corpus runs out of distinct pairs before
    * `numMerges` — a fixed merge count is part of the deterministic
    * replay contract, so a silent early stop would desync the oracle.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 65536): Seq[Merge] =
    trainFromWordFrequencies(
      wordFrequencies(docs, textCol, maxVocabWords), numMerges)

  /** [[train]] from an already-built `(word, freq)` table — the entry
    * point for callers that reuse one corpus pass across training and
    * downstream consumers (segmentation, tokenization): the vocabulary
    * is V-bounded, so holding it and re-deriving from it is
    * model-sized work.
    */
  def trainFromWordFrequencies(wordFreq: DataFrame,
      numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val wf: Dataset[(String, Long)] =
      wordFreq.select(col("word"), col("freq")).as[(String, Long)]
        .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      for (r <- 1 to numMerges) {
        val learned = merges.map(m => (m.lhs, m.rhs)).toSeq
        val best = wf.map { case (w, f) => (applyMerges(w, learned), f) }
          .toDF("syms", "freq")
          .withColumn("l", slice(col("syms"), lit(1), size(col("syms")) - 1))
          .withColumn("r", slice(col("syms"), lit(2), size(col("syms")) - 1))
          .select(col("freq"), explode(arrays_zip(col("l"), col("r"))).as("p"))
          .groupBy(col("p.l").as("a"), col("p.r").as("b"))
          .agg(sum("freq").as("cnt"))
          .orderBy(desc("cnt"), asc("a"), asc("b"))
          .limit(1).collect()
        require(best.nonEmpty,
          s"corpus exhausted after ${r - 1} merges — every word is a " +
            s"single symbol; ask for fewer than $numMerges merges")
        val row = best.head
        merges += Merge(r.toLong, row.getString(0), row.getString(1),
          row.getString(0) + row.getString(1), row.getLong(2))
      }
      merges.toSeq
    } finally {
      wf.unpersist()
      ()
    }
  }

  /** [[train]] as a query result frame, ordered by rank. */
  def trainDf(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 65536): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges, maxVocabWords).toDF()
      .orderBy("merge_rank")
  }

  /** Segment each word of the bounded vocabulary with the trained
    * merges: `(word, freq, pieces)` where `pieces` is the subword
    * sequence space-joined. A narrow map — the merge list rides the
    * closure (driver-sized, broadcast by the task serializer), the
    * corpus never shuffles.
    */
  def segment(wordFreq: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val pairs = merges.map(m => (m.lhs, m.rhs))
    wordFreq.select(col("word"), col("freq")).as[(String, Long)]
      .map { case (w, f) => (w, f, applyMerges(w, pairs).mkString(" ")) }
      .toDF("word", "freq", "pieces")
  }

  /** Apply learned merges IN RANK ORDER to one word, starting from its
    * character symbols — BPE's tokenization rule (each merge is a full
    * left-to-right pass; rank order, not greedy-longest, is what makes
    * training counts consistent with tokenization).
    */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] = {
    // CODE POINTS, not UTF-16 units: `word.map(_.toString)` splits a
    // surrogate pair into two broken halves, while the DuckDB oracle's
    // substring() iterates characters — with the open alphabet the two
    // must agree on non-BMP input (emoji, rare CJK)
    var syms: IndexedSeq[String] = word.codePoints().toArray.toIndexedSeq
      .map(cp => new String(Character.toChars(cp)))
    merges.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
    syms
  }

  /** Canonical left-to-right non-overlapping merge of one pair. */
  private def applyMerge(syms: IndexedSeq[String], a: String,
      b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** Character-symbol initialization of a `(word, freq)` table. */
  private def symsInitSql(src: String, out: String): String =
    s"""$out AS (
       |  SELECT word, freq,
       |         [substring(word, CAST(i AS INT), 1)
       |          FOR i IN range(1, length(word) + 1)] AS syms
       |  FROM $src)""".stripMargin

  // e: position explode; s: (sym, next). MATERIALIZED is load-bearing
  // on the vocab chain: s/b are each referenced twice, so inlining
  // would double the plan per rank — 2^N copies of the corpus scan by
  // the last merge.
  private def symsExplodeSql(i: Int, src: String, p: String): String =
    s"""${p}e$i AS (
       |  SELECT word, freq, syms,
       |         unnest(range(1, len(syms) + 1)) AS j FROM $src),
       |${p}s$i AS MATERIALIZED (
       |  SELECT word, freq, j AS pos, syms[j] AS sym, syms[j + 1] AS nxt
       |  FROM ${p}e$i)""".stripMargin

  // h/g/x: islands parity = the canonical scanner's 1st/3rd/5th… match
  // per identical-symbol run; y/out: rebuild, dropping positions a
  // preceding merge consumed. `b$i` (the rank's argmax) is shared by
  // every chain applying the same training run.
  private def applyTailSql(i: Int, p: String, out: String): String =
    s"""${p}h$i AS (
       |  SELECT s.word, s.freq, s.pos, s.sym, s.nxt,
       |         CASE WHEN s.sym = b.a AND s.nxt = b.b THEN 1 ELSE 0 END AS hit
       |  FROM ${p}s$i s CROSS JOIN b$i b),
       |${p}g$i AS (
       |  SELECT *, pos - row_number()
       |      OVER (PARTITION BY word, hit ORDER BY pos) AS grp
       |  FROM ${p}h$i),
       |${p}x$i AS (
       |  SELECT *, CASE WHEN hit = 1 AND row_number()
       |      OVER (PARTITION BY word, hit, grp ORDER BY pos) % 2 = 1
       |    THEN 1 ELSE 0 END AS act FROM ${p}g$i),
       |${p}y$i AS (
       |  SELECT word, freq, pos,
       |         CASE WHEN act = 1 THEN sym || nxt ELSE sym END AS ns,
       |         lag(act) OVER (PARTITION BY word ORDER BY pos) AS pact
       |  FROM ${p}x$i),
       |$out AS MATERIALIZED (
       |  SELECT word, freq, list(ns ORDER BY pos) AS syms FROM ${p}y$i
       |  WHERE pact IS NULL OR pact = 0 GROUP BY word, freq)""".stripMargin

  /** The DuckDB replay of [[train]] + [[segment]] as stacked CTEs —
    * one `(pair-count → lexically-tie-broken argmax → islands-parity
    * merge)` group per rank. `finalSelect` chooses the output: the
    * merge table (`bpe_train`), the segmented vocabulary
    * (`bpe_segment`) or the corpus tokenization (`bpe_tokenize_docs`).
    *
    * `withOovChain` adds a SECOND apply-only chain `ov0..ovN`: the
    * distinct corpus words NOT in the capped training vocabulary,
    * segmented by the same rank argmaxes (`b$$i`) — the oracle of the
    * zero-OOV fallback path (every chain replays the one canonical
    * scanner, so fallback segmentation ≡ vocabulary segmentation).
    */
  def oracleSql(numMerges: Int, maxVocabWords: Int,
      finalSelect: String, withOovChain: Boolean = false): String = {
    val init =
      s"""WITH tok AS (
         |  SELECT ${asciiLowerSql("unnest(regexp_split_to_array(text, '\\s+'))")} AS word
         |  FROM documents),
         |wf AS (
         |  SELECT word, count(*) AS freq FROM tok
         |  WHERE length(word) > 0 GROUP BY word
         |  ORDER BY freq DESC, word LIMIT $maxVocabWords),
         |${symsInitSql("wf", "w0")}""".stripMargin
    val ovInit =
      if (!withOovChain) ""
      else s""",
         |ovw AS (
         |  SELECT DISTINCT word, CAST(1 AS BIGINT) AS freq FROM tok
         |  WHERE length(word) > 0
         |    AND word NOT IN (SELECT word FROM wf)),
         |${symsInitSql("ovw", "ov0")}""".stripMargin
    val iters = (1 to numMerges).map { i =>
      val vocabRound =
        s"""${symsExplodeSql(i, s"w${i - 1}", "")},
           |p$i AS (
           |  SELECT sym AS a, nxt AS b, sum(freq) AS cnt FROM s$i
           |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
           |b$i AS MATERIALIZED (
           |  SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
           |${applyTailSql(i, "", s"w$i")}""".stripMargin
      if (!withOovChain) vocabRound
      else
        s"""$vocabRound,
           |${symsExplodeSql(i, s"ov${i - 1}", "ov")},
           |${applyTailSql(i, "ov", s"ov$i")}""".stripMargin
    }
    ((init + ovInit) +: iters).mkString(",\n") + "\n" + finalSelect
  }
}
