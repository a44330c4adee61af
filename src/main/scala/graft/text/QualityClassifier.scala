package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the supervised-classifier stage of
  * production corpus pipelines (CCNet / DCLM / FineWeb all gate on a
  * cheap text classifier trained on weak labels), expressed
  * Spark-first as a NAIVE BAYES log-linear model so both halves scale
  * AND replay exactly:
  *
  *  - TRAINING IS COUNTING: one `groupBy(token)` over the weakly
  *    labeled corpus (map-side partial sums, ONE shuffle of the
  *    vocabulary; order-independent integer counts — no gradient
  *    loop, no driver-held dense vector), pruned to a BOUNDED model:
  *    `minCount` document-frequency floor, then the `vocabCap` most
  *    frequent tokens via `orderBy(...).limit(...)` (Spark plans
  *    TakeOrderedAndProject — distributed partial top-k, never a
  *    single-partition vocabulary sort). A bounded model broadcasts
  *    at any corpus scale.
  *  - SCORING IS A BROADCAST JOIN: token stream ⋈ model, one integer
  *    sum per document. Per-token log-likelihood ratios are
  *    pre-quantized to MILLI-NATS (the one transcendental per token
  *    happens once, model-side), so each document's score is an
  *    EXACT integer sum — deterministic under any partitioning, and
  *    the whole train+score pipeline replays in plain SQL
  *    (`quality_classifier` is hash-checked against DuckDB).
  *
  * Laplace-smoothed multinomial NB with a document-count prior:
  * `score(d) = ln(P/N) + Σ_tok ln[ (pos_t+1)/(posTot+V) ·
  * (negTot+V)/(neg_t+1) ]`, all in milli-nats.
  */
object QualityClassifier {

  /** Per-document scores under a model trained on `label` (the weak
    * supervision signal — a heuristic, a source allowlist, an
    * existing smaller model's verdicts). Output: one row per input
    * document — (doc_id, score_milli, weak_label, pred); `pred` is
    * the NB decision `score_milli > 0`.
    */
  def naiveBayesScores(docs: DataFrame, idCol: String, textCol: String,
      label: Column, minCount: Int = 3, vocabCap: Int = 4096): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        label.cast("int").as("y"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks.groupBy("tok")
      .agg(sum("y").cast("long").as("pos"), count(lit(1)).as("tot"))
      .filter(col("tot") >= minCount)
    // bounded model: distributed top-k, deterministic tie-break
    val kept = counts.orderBy(col("tot").desc, col("tok")).limit(vocabCap)
    val tots = kept.agg(sum("pos").as("posTot"),
      sum(col("tot") - col("pos")).as("negTot"), count(lit(1)).as("v"))
    val model = kept.crossJoin(broadcast(tots)).select(col("tok"),
      round((log((col("pos") + 1).cast("double") /
          (col("posTot") + col("v")).cast("double")) -
        log((col("tot") - col("pos") + 1).cast("double") /
          (col("negTot") + col("v")).cast("double"))) * 1000)
        .cast("long").as("llr_milli"))
    val prior = docs.agg(
      round(log((sum(label.cast("int")) + 1).cast("double") /
        (count(lit(1)) - sum(label.cast("int")) + 1).cast("double")) * 1000)
        .cast("long").as("prior_milli"))
    val docScores = toks.join(broadcast(model), Seq("tok"))
      .groupBy("doc_id").agg(sum("llr_milli").as("tok_milli"))
    docs.select(col(idCol).as("doc_id"), label.cast("int").as("weak_label"))
      .join(docScores, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .select(col("doc_id"),
        (coalesce(col("tok_milli"), lit(0L)) + col("prior_milli"))
          .as("score_milli"),
        col("weak_label"))
      .withColumn("pred",
        when(col("score_milli") > 0L, lit(1)).otherwise(lit(0)))
  }
}
