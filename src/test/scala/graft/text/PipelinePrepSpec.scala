package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Packing (concat-and-chunk) and benchmark decontamination. */
class PipelinePrepSpec extends AnyFunSuite with SparkSpec {

  test("truncateTokens: caps at N whitespace tokens, shorter docs pass " +
    "through normalized, empty/whitespace docs yield empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a  b\tc\nd e f"), // 6 tokens, mixed whitespace
      (2L, "one two"),
      (3L, ""),
      (4L, "   \t  ")
    ).toDF("id", "text")
    val out = docs.select(col("id"),
      TextFunctions.truncateTokens(col("text"), 4).as("t"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out(0) === "a b c d", "cap at 4, whitespace runs collapse")
    assert(out(1) === "one two", "short docs pass through normalized")
    assert(out(2) === "")
    assert(out(3) === "", "whitespace-only docs truncate to empty")
  }

  test("chunkDocs: stride windows with overlap, tail window short, " +
    "empty docs yield no chunks, boundaries exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 10 tokens a..j, size 4, stride 3 → starts 0,3,6,9
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextFunctions.chunkDocs(docs, "doc_id", "text", 4, 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 4L, "a b c d"),
      (1L, 1L, 4L, "d e f g"), // overlap of 1 with the previous window
      (1L, 2L, 4L, "g h i j"),
      (1L, 3L, 1L, "j"),       // tail window short, never empty
      (2L, 0L, 2L, "x y")))
  }

  test("packBins: offsets are the shard cumsum, bins chunk by budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b c d"),          // 4 tokens, start 0,  bin 0
      (2L, "s1", "e f g"),            // 3 tokens, start 4,  bin 0
      (3L, "s1", "h i j k l m"),      // 6 tokens, start 7,  bin 1 (budget 5)
      (4L, "s2", "x y"))              // other shard restarts at 0
      .toDF("doc_id", "source", "text")
    val out = Packing.packBins(docs, "doc_id", "text", "source", 5L)
      .select("doc_id", "token_cnt", "tok_start", "bin_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 4L, 0L, 0L), (2L, 3L, 4L, 0L),
      (3L, 6L, 7L, 1L), (4L, 2L, 0L, 0L)))
  }

  test("decontaminate drops n-gram overlap, keeps clean and short docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),     // shares 3-gram with bench
      (2L, "completely unrelated text here"),
      (3L, "too short"))                     // < 3 tokens: always kept
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a quick brown fox runs")).toDF("doc_id", "text")
    val kept = Decontaminate.clean(corpus, bench, "doc_id", "text", ngram = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 3L))
  }
}
