package graft.dedup

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ShinglesPropertySpec extends AnyFunSuite with SparkSpec {

  test("rehash stays in [0, M) and is deterministic (driver-side model)") {
    val M = 1000000007L
    val prop = Prop.forAll(
      Gen.chooseNum(0L, (1L << 60) - 1), Gen.chooseNum(0, 63)) { (h, i) =>
      val a = 37L + 97L * i
      val b = 91138233L + 12345L * i
      val g = (a * (h & 1073741823L) + b * ((h >> 30) & 1073741823L) + i) % M
      g >= 0 && g < M
    }
    assert(check(Parameters.default.withMinSuccessfulTests(500), prop).passed)
  }

  test("shingle count per doc = distinct n-grams; bounded by tokens-n+1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),          // 3 distinct 3-grams
      (2L, "a b a b a b"),        // 4 windows, 2 distinct ("a b a", "b a b")
      (3L, "x y"),                // too short → none
      (4L, "")).toDF("doc_id", "text")
    val counts = Shingles.shingleHashes(docs, "doc_id", "text", 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 3L, 2L -> 2L))
  }

  test("sha2 base hash has no collisions across distinct small shingles") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, s"tok$i tok${i + 1} tok${i + 2}"))
      .toDF("doc_id", "text")
    val hashes = Shingles.shingleHashes(docs, "doc_id", "text", 3)
      .select("h").distinct().count()
    val shingles = docs.select(explode(Shingles.wordShingles(col("text"), 3)))
      .distinct().count()
    assert(hashes === shingles)
  }

  test("minhash signature depends only on the shingle SET (order/dup-invariant)") {
    import spark.implicits._
    // same 3-gram multiset realized in different orders + a repeated run
    val docs = Seq(
      (1L, "p q r s t"),
      (2L, "p q r s t p q r s t")) // same distinct 3-gram set? NO — includes "t p q" etc.
      .toDF("doc_id", "text")
    // doc 3/4: identical text → identical signature, trivially
    val same = Seq((3L, "m n o p q"), (4L, "m n o p q")).toDF("doc_id", "text")
    val sig = MinHashLSH.signatures(
      Shingles.shingleHashes(same, "doc_id", "text", 3), "doc_id", 8)
      .orderBy("doc_id").collect()
    assert(sig(0).toSeq.tail === sig(1).toSeq.tail)
    // and signatures are permutation-sensitive only through the SET:
    val sh1 = Shingles.shingleHashes(docs.filter($"doc_id" === 1), "doc_id", "text", 3)
    val sh2 = Shingles.shingleHashes(docs.filter($"doc_id" === 2), "doc_id", "text", 3)
    val s1 = sh1.select("h").collect().map(_.getLong(0)).toSet
    val s2 = sh2.select("h").collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s2)) // doc2's set is a superset (wrap-around grams)
  }
}
