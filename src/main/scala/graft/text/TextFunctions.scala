package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization,
  * counting, quality ratios, language ID, fingerprinting. All are pure
  * codegen'd Column expressions (no UDFs — SURVEY.md §2.10 note), so
  * they stay inside whole-stage codegen and scale linearly per
  * partition with no shuffle.
  *
  * Cross-engine notes (the DuckDB oracle must reproduce results
  * bit-for-bit): tokenization is a literal single-space split, ratios
  * are kept as exact integer counts wherever hashed, and fingerprints
  * are sha2-256 over deterministic normalizations.
  */
object TextFunctions {

  /** Whitespace-normalized tokens: trim + collapse runs of whitespace,
    * split on single space (identical semantics in DuckDB via
    * `string_split(regexp_replace(trim(x), '\s+', ' ', 'g'), ' ')`).
    */
  def tokens(text: Column): Column =
    split(regexp_replace(trim(text), "\\s+", " "), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** CONTEXT-LENGTH CAP — truncate a document to its first `maxTokens`
    * whitespace tokens (the sequence-length guard every training
    * pipeline applies before packing; a doc past the model's context
    * either truncates here or explodes the packer downstream).
    * Row-local (`slice` + `array_join` — no shuffle, no UDF), exactly
    * replayable in SQL (`list_slice`/`array_to_string` over the same
    * whitespace tokenization). Whitespace runs collapse to single
    * spaces in the rebuilt text — the same normalization [[tokens]]
    * applies everywhere else.
    */
  def truncateTokens(text: Column, maxTokens: Int): Column = {
    require(maxTokens >= 0, s"maxTokens=$maxTokens must be >= 0")
    array_join(slice(filter(tokens(text), t => length(t) > 0),
      1, maxTokens), " ")
  }

  /** SLIDING-WINDOW CHUNKING — the other half of sequence shaping
    * ([[Packing]] concatenates short docs into bins; this SPLITS long
    * docs into overlapping windows, the RAG/pretraining chunker): one
    * output row per (doc, window), window `i` covering tokens
    * `[i·stride, i·stride + size)` — `stride < size` gives the overlap
    * that keeps a fact straddling a boundary inside at least one
    * window. Row-local throughout (`sequence` → `posexplode` → `slice`
    * — no shuffle, no UDF); empty docs produce no chunks. Output:
    * `(doc_id, chunk_id, chunk_tokens, chunk_text)`.
    */
  def chunkDocs(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(size >= 1, s"size=$size must be >= 1")
    require(stride >= 1, s"stride=$stride must be >= 1")
    val tk = filter(tokens(col(textCol)), t => length(t) > 0)
    docs.select(col(idCol).as("doc_id"), tk.as("__tk"))
      .filter(size_(col("__tk")) > 0)
      .select(col("doc_id"), col("__tk"),
        posexplode(sequence(lit(0), size_(col("__tk")) - 1, lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__tk"), col("__start") + 1, lit(size)).as("__c"))
      .select(col("doc_id"), col("chunk_id"),
        size_(col("__c")).cast("long").as("chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  // `size` the function, shadowed by the chunker's param name
  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)

  def charCount(text: Column): Column = length(text)

  /** Count of punctuation characters from an explicit class (explicit,
    * not `\p{Punct}`/`[[:punct:]]`, because Java and RE2 class
    * membership differs).
    */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:'\"()-]", ""))

  /** Number of tokens found in `words` (e.g. a stopword list).
    *
    * Implemented as one codegen'd `regexp_extract_all` over the
    * whitespace-normalized text rather than `filter(tokens(text), …)`:
    * array higher-order functions evaluate INTERPRETED in Spark
    * (CodegenFallback — the 15-35× penalty Shingles.scala documents),
    * and this sits in the lang-id/quality hot path of every corpus
    * scan. Token semantics are preserved exactly: the normalized text
    * is single-space separated, the match consumes only the word (the
    * trailing boundary is a lookahead), so consecutive stopwords
    * sharing one space each count — identical to counting `tk IN
    * (words)` over the split, which is what the DuckDB oracles replay
    * as `list_filter`.
    */
  def wordHits(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "wordHits needs a non-empty lexicon")
    val alt = words.map(java.util.regex.Pattern.quote).mkString("|")
    size(regexp_extract_all(
      regexp_replace(trim(text), "\\s+", " "),
      lit(s"(?:^| )(?:$alt)(?= |$$)"), lit(0)))
  }

  /** Tiny per-language function-word lexicons for the n-gram/stopword
    * language-ID heuristic. Deliberately small so the oracle SQL stays
    * writable; extend per deployment.
    */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "y", "es", "una", "por"))

  /** Language-ID: argmax of lexicon hits; 'und' when no lexicon matches.
    * Ties break by lexicon order (first wins), matching the oracle's
    * CASE chain.
    */
  def langId(text: Column): Column = {
    val hits = langLexicons.map { case (lang, words) => lang -> wordHits(text, words) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((lang, h), els) =>
      when(h === best && h > 0, lit(lang)).otherwise(els)
    }
  }

  /** BPE-ish subword-boundary token count: words and standalone
    * punctuation marks each count once (`\w+|[^\w\s]`) — the cheap
    * pre-tokenizer approximation of byte-pair-encoding vocabularies
    * (ASCII-safe across Java and RE2 regex engines).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Stable document fingerprint: sha2-256 of the lower-cased,
    * whitespace-collapsed text. Equal fingerprints = exact duplicates
    * modulo case/whitespace.
    */
  def fingerprint(text: Column): Column =
    sha2(concat_ws(" ", tokens(lower(text))), 256)

  /** PII scrubbing — the redaction pass every shipped training corpus
    * runs: emails, international-ish phone numbers and IPv4 addresses
    * are replaced with typed placeholder tags. Single codegen'd
    * `regexp_replace` chain (no UDF); patterns deliberately simple and
    * ANSI-regex-portable so the oracle replays them verbatim. Order
    * matters: emails first (their local parts can contain digit runs a
    * phone pattern would shred).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Heuristic quality score in [0,1]: rewards reasonable length and
    * penalizes punctuation soup. Double-valued — verified by property
    * tests, not by the hash oracle (see PipelineQueries).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val punct = punctCount(text).cast("double")
    val chars = charCount(text).cast("double")
    val lengthTerm = least(toks / lit(64.0), lit(1.0))
    val punctTerm = lit(1.0) - least(punct / greatest(chars, lit(1.0)) * lit(4.0), lit(1.0))
    lengthTerm * lit(0.6) + punctTerm * lit(0.4)
  }
}
