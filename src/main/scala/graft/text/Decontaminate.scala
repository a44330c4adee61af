package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Shingles

/** Benchmark decontamination — drop every corpus document that shares
  * at least one word n-gram with an evaluation set. A named stage in
  * LLM data pipelines: eval contamination silently inflates benchmark
  * scores, so the overlap check runs over the full corpus.
  *
  * Scale shape: the benchmark side is tiny (eval sets are thousands of
  * rows) — its distinct shingle set broadcasts, so contamination
  * detection is a broadcast LEFT SEMI join on the corpus shingle
  * stream (no shuffle of corpus shingles), followed by one aggregate
  * to distinct contaminated ids and a broadcast anti join back onto
  * the corpus. Documents shorter than the shingle width can never
  * match and are always kept.
  */
object Decontaminate {

  /** Corpus rows whose documents share NO n-gram with `bench`. */
  def clean(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3): DataFrame = {
    val corpusShingles = Shingles.shingleHashesAll(corpus, idCol, textCol, ngram)
    val benchShingles = Shingles.shingleHashes(bench, idCol, textCol, ngram)
      .select("h").distinct()
    val contaminated = corpusShingles
      .join(broadcast(benchShingles), Seq("h"), "left_semi")
      .select(idCol).distinct()
    corpus.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }
}
