package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity filtering — the OTHER classic
  * corpus-quality gate (CCNet scores every Common Crawl paragraph with
  * a KenLM n-gram model trained on Wikipedia and keeps the
  * low-perplexity tail; Gopher/RefinedWeb inherit the idea), expressed
  * Spark-first so both halves scale and replay exactly:
  *
  *  - BIGRAM FORMATION IS ARRAY-LOCAL: adjacent-token pairs come from
  *    `zip_with(slice(tk, 1, n-1), slice(tk, 2, n-1), ...)` inside the
  *    row — zero shuffle, no positional self-join, no per-document
  *    window sort.
  *  - TRAINING IS COUNTING, THE MODEL IS BOUNDED: the vocabulary is
  *    the reference corpus's `vocabCap` most frequent tokens
  *    (distributed top-k — `TakeOrderedAndProject`, never a global
  *    sort), everything else maps to `<unk>`; bigram counts cap at
  *    `bigramCap` the same way. Both tables broadcast at any corpus
  *    scale; prefix counts are ≤ vocab-sized by construction.
  *  - SCORING IS BROADCAST JOINS SUMMING INTEGERS: per-bigram
  *    Laplace-smoothed log-probabilities are pre-quantized to
  *    MILLI-NATS model-side (the one transcendental per MODEL ROW, not
  *    per corpus token), so each document's negative log-likelihood is
  *    an exact integer sum — deterministic under any partitioning, and
  *    the whole train+score arc replays in plain SQL
  *    (`lm_perplexity` is hash-checked against DuckDB).
  *
  * Model: `P(c|p) = (cnt(p,c) + 1) / (cnt(p·) + V)` with `V` = vocab
  * size + 1 (`<unk>`). A bigram beyond `bigramCap` or unseen in the
  * reference scores the prefix's miss mass `1/(cnt(p·)+V)`; a prefix
  * never seen in the reference scores the uniform floor `1/V`.
  */
object NgramLm {

  val Unk = "<unk>"

  /** Per-document bigram negative log-likelihood under a model trained
    * on the `ref` slice of the same frame (CCNet trains on Wikipedia
    * and scores Common Crawl; the weak-label slice plays Wikipedia
    * here). Output: one row per input document —
    * `(doc_id, n_bigrams, nll_milli, keep)`; `keep` is the CCNet-style
    * gate `nll_milli <= keepMaxAvgMilli * n_bigrams` (average per-token
    * NLL at most `keepMaxAvgMilli` milli-nats; integer compare, no
    * division). Documents under two tokens carry `(0, 0, keep=1)`.
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
      ref: Column, vocabCap: Int = 4096, bigramCap: Int = 65536,
      keepMaxAvgMilli: Long = 6000L): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      ref.cast("int").as("is_ref"),
      filter(TextFunctions.tokens(col(textCol)),
        t => length(t) > 0).as("tk"))
    // adjacent pairs, formed inside the row (no shuffle): slice is
    // 1-indexed; greatest(...,0) keeps 0- and 1-token docs at an empty
    // pair list instead of a negative slice length
    val pairs0 = base.select(col("doc_id"), col("is_ref"),
      explode(expr(
        """zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)),
          |         slice(tk, 2, greatest(size(tk) - 1, 0)),
          |         (x, y) -> named_struct('p0', x, 'c0', y))""".stripMargin))
        .as("pr"))
      .select(col("doc_id"), col("is_ref"),
        col("pr.p0").as("p0"), col("pr.c0").as("c0"))
    // vocabulary: the reference slice's top-k tokens, deterministic
    // tie-break — the model must not depend on partitioning
    val refUni = base.filter(col("is_ref") === 1)
      .select(explode(col("tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val vocab = refUni.orderBy(col("cnt").desc, col("tok")).limit(vocabCap)
      .select("tok")
    val vv = vocab.agg((count(lit(1)) + 1).as("V"))
    def unkMapped(df: DataFrame, from: String, to: String): DataFrame =
      df.join(broadcast(vocab.withColumnRenamed("tok", from)
          .withColumn(s"__in_$to", lit(1))), Seq(from), "left")
        .withColumn(to, when(col(s"__in_$to").isNotNull, col(from))
          .otherwise(lit(Unk)))
        .drop(from, s"__in_$to")
    val pairs = unkMapped(unkMapped(pairs0, "p0", "p"), "c0", "c")
    val refPairs = pairs.filter(col("is_ref") === 1)
    // prefix counts: ≤ V rows by construction (every p is in-vocab or
    // <unk>); bigram counts: bounded by the deterministic top-k cap
    val cp = refPairs.groupBy("p").agg(count(lit(1)).as("cp"))
    val cb = refPairs.groupBy("p", "c").agg(count(lit(1)).as("cb"))
      .orderBy(col("cb").desc, col("p"), col("c")).limit(bigramCap)
    // milli-nat quantization happens MODEL-side — identical float
    // expressions to the oracle SQL, term for term.
    //
    // EXACTNESS CAVEAT (accepted): unlike sqrt (correctly rounded by
    // IEEE 754, which is what makes Sampling's sqrt-weights bit-exact
    // across engines), ln carries a 1-ulp rounding allowance in both
    // libm contracts, so JVM Math.log and DuckDB's log may disagree in
    // the last bit. round(x*1000) then flips only when the TRUE value
    // lies within ~1 ulp of a .5 milli-nat boundary — for the ln
    // magnitudes here (|x| ≤ ~20, ulp ≈ 2e-15 absolute) that is a
    // ~4e-12 boundary band per distinct (cb, cp, V) triple, i.e. a
    // vanishing per-model probability, and the failure mode is a LOUD
    // oracle hash mismatch on lm_perplexity, never a silently wrong
    // standalone result (the Spark side alone is deterministic: one
    // JVM libm, exact integer sums after quantization). An exact
    // fixed-point log over the unbounded (cb, cp) integer domain is
    // not expressible in portable SQL, so the tail risk is documented
    // and accepted rather than hidden behind a pseudo-fix.
    val bm = cb.join(cp, Seq("p")).crossJoin(broadcast(vv))
      .select(col("p"), col("c"),
        round(log((col("cb") + 1).cast("double") /
          (col("cp") + col("V")).cast("double")) * 1000)
          .cast("long").as("lp_milli"))
    val pm = cp.crossJoin(broadcast(vv))
      .select(col("p"),
        round(log(lit(1.0) / (col("cp") + col("V")).cast("double")) * 1000)
          .cast("long").as("miss_milli"))
    val fl = vv.select(
      round(log(lit(1.0) / col("V").cast("double")) * 1000)
        .cast("long").as("floor_milli"))
    val ds = pairs
      .join(broadcast(bm), Seq("p", "c"), "left")
      .join(broadcast(pm), Seq("p"), "left")
      .crossJoin(broadcast(fl))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(-coalesce(col("lp_milli"), col("miss_milli"), col("floor_milli")))
          .as("nll_milli"))
    base.select("doc_id")
      .join(ds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_milli"), lit(0L)).as("nll_milli"))
      .withColumn("keep",
        when(col("nll_milli") <= lit(keepMaxAvgMilli) * col("n_bigrams"),
          lit(1)).otherwise(lit(0)))
  }
}
