package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-salience scoring over a document corpus: per-document term
  * frequency joined with corpus document frequency, ranked tf-idf-style
  * without floats — `tf DESC, df ASC` orders exactly like
  * `tf · log(N/df)` for any fixed tf (rarer ⇒ larger idf), and keeping
  * the raw integers makes the result byte-identical across engines.
  *
  * Scale shape: tf is one hash-agg over the exploded token table
  * (map-side combine); df is a second agg over tf's output (already one
  * row per (doc, term) — never re-reads the corpus); the tf×df join
  * keys on `term`, where df is vocabulary-sized — broadcast when small,
  * plain shuffle join at web-corpus vocabulary scale. The final top-k
  * window partitions by doc, riding tf's (doc-keyed) shuffle.
  */
object TfIdf {

  /** tf per (doc, term): one row per distinct term occurrence count. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k salient terms per document:
    * `(idCol, rank, term, tf, df)` — rank by `tf DESC, df ASC, term ASC`.
    */
  def topTermsPerDoc(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"))
  }
}
