package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Deterministic hash sampling: reproducibility, rate accuracy,
  * cross-table joinability, stratified rates.
  */
class SamplingSpec extends AnyFunSuite with SparkSpec {

  test("temperatureMixSqrt: √n flattening — the minority group keeps a " +
    "LARGER fraction than the majority, totals track the budget, and the " +
    "decision is partitioning-independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 9:1 skew, 5000 docs
    val docs = (0 until 5000).map(i =>
      (f"d$i%05d", if (i % 10 == 0) "tail" else "head")).toDF("doc_id", "g")
    val kept = Sampling.temperatureMixSqrt(docs, "doc_id", "g", budget = 1000L)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum
    assert(math.abs(total - 1000L) < 150, s"kept $total of budget 1000")
    // natural shares are 90/10; √n flattening targets √9:√1 = 3:1
    val headFrac = kept("head").toDouble / 4500
    val tailFrac = kept("tail").toDouble / 500
    assert(tailFrac > 2 * headFrac,
      s"flattening must favor the tail: head=$headFrac tail=$tailFrac")
    assert(kept("head").toDouble / kept("tail") < 4.5,
      s"kept ratio should approach 3:1, got ${kept("head")}:${kept("tail")}")
    // deterministic in the key, not the partitioning
    val a = Sampling.temperatureMixSqrt(docs.repartition(1), "doc_id", "g", 1000L)
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    val b = Sampling.temperatureMixSqrt(docs.repartition(11), "doc_id", "g", 1000L)
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(a === b)
    // a budget past the population keeps everything (threshold clamps)
    assert(Sampling.temperatureMixSqrt(docs, "doc_id", "g", 100000L)
      .count() === 5000L)
  }

  test("temperatureMixSqrt: 10k-group domain runs as a broadcast join " +
    "(no O(groups) expression tree), group types are generic, null " +
    "groups drop, column order survives, maxGroups fails loudly") {
    import spark.implicits._
    // 10k INTEGER groups, 3 docs each — the old when-chain folded a
    // 10k-deep catalyst tree here and assumed string groups
    val docs = (0 until 30000).map(i => (f"d$i%06d", i % 10000))
      .toDF("doc_id", "g")
    val kept = Sampling.temperatureMixSqrt(docs, "doc_id", "g", budget = 3000L)
    assert(kept.columns.toSeq === Seq("doc_id", "g"),
      "input column order must survive the threshold join")
    val n = kept.count()
    assert(n > 1500 && n < 4500, s"kept $n of budget 3000")
    // null-group rows carry no threshold and drop; a budget past the
    // population keeps every non-null-group row
    val sdocs = (0 until 100)
      .map(i => (s"s$i", if (i < 10) null else "g1")).toDF("doc_id", "g")
    assert(Sampling.temperatureMixSqrt(sdocs, "doc_id", "g", 1000000L)
      .count() === 90L)
    // ...but the null group's √n weight still counts toward the
    // NORMALIZER, exactly like the oracle's sum over the full GROUP BY:
    // 100 g1 + 300 null ⇒ totW = 10000 + 17321, so budget 50 keeps
    // ≈ 50·10000/27321 ≈ 18 g1 docs — NOT ≈ 50 (which a null-dropping
    // normalizer would produce)
    val ndocs = ((0 until 100).map(i => (s"a$i", "g1")) ++
      (0 until 300).map(i => (s"b$i", null))).toDF("doc_id", "g")
    val keptN = Sampling.temperatureMixSqrt(ndocs, "doc_id", "g", 50L).count()
    assert(keptN > 5 && keptN < 35,
      s"null-group weight must deflate the thresholds: kept $keptN, " +
        "expected ~18 (a null-dropping normalizer keeps ~50)")
    // the cardinality bound is enforced by a limit probe, loudly
    val err = intercept[IllegalArgumentException] {
      Sampling.temperatureMixSqrt(docs, "doc_id", "g", 10L, maxGroups = 100)
    }
    assert(err.getMessage.contains("maxGroups"))
  }

  test("quotaPerGroup: exact cap per group, under-quota groups keep " +
    "everything, partitioning-independent, and the plan carries the " +
    "partial WindowGroupLimit (skew-safe top-k before the exchange)") {
    import spark.implicits._
    val docs = ((0 until 500).map(i => (f"h$i%04d", "big")) ++
      (0 until 7).map(i => (s"t$i", "small"))).toDF("doc_id", "g")
    val out = Sampling.quotaPerGroup(docs, "doc_id", "g", 50)
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 50L, "small" -> 7L))
    val a = Sampling.quotaPerGroup(docs.repartition(1), "doc_id", "g", 50)
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    val b = Sampling.quotaPerGroup(docs.repartition(13), "doc_id", "g", 50)
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(a === b, "the kept set must not depend on partitioning")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must plan the partial group limit:\n$plan")
    // duplicate keys keep or drop TOGETHER (rank ties — the decision
    // is a function of the key, never of which physical row ranked
    // first): 4 distinct keys x2 rows, quota 3 → ranks 1,1,3,3,5,5,7,7
    // → exactly the 2 smallest-hash keys survive, both copies each
    val dups = (0 until 4).flatMap(i => Seq((s"k$i", "g", "r1"),
      (s"k$i", "g", "r2"))).toDF("doc_id", "g", "tag")
    val keptDup = Sampling.quotaPerGroup(dups, "doc_id", "g", 3)
      .select("doc_id").collect().map(_.getString(0)).toSeq
    assert(keptDup.size === 4 && keptDup.distinct.size === 2,
      s"tied duplicates must ride together: $keptDup")
  }

  test("shardCorpus: a deterministic permutation — shards balanced, " +
    "ordinals dense per shard, identical under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0 until 5000).map(i => (f"d$i%05d", i)).toDF("doc_id", "x")
    val a = Sampling.shardCorpus(docs.repartition(1), "doc_id", 16)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = Sampling.shardCorpus(docs.repartition(13), "doc_id", 16)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a === b, "the permutation must not depend on partitioning")
    val byShard = a.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    assert(byShard.keySet.size === 16)
    // hash balance: no shard more than 2x the mean
    assert(byShard.values.map(_.size).max <= 2 * 5000 / 16)
    // ordinals are 1..n dense within every shard
    byShard.values.foreach(ps => assert(ps == (1L to ps.size).toSeq))
    // it IS a shuffle: within a shard, hash order must not reproduce
    // the lexicographic input order (vanishingly unlikely for ~300 docs)
    val shard0 = a.filter(_._2 == 0L).sortBy(_._3).map(_._1).toSeq
    assert(shard0 !== shard0.sorted,
      "hash order degenerated to input order — not a permutation")
  }

  test("reproducible, approximately the requested rate, joinable across tables") {
    import spark.implicits._
    val a = spark.range(10000).toDF("k")
    val s1 = Sampling.byHash(a, "k", 0.3).as[Long].collect().toSet
    val s2 = Sampling.byHash(a, "k", 0.3).as[Long].collect().toSet
    assert(s1 === s2)                               // retry/recompute stable
    assert(math.abs(s1.size - 3000) < 300, s"rate off: ${s1.size}")
    // another table sampled by the same key keeps the SAME keys
    val b = spark.range(10000).toDF("k")
    val s3 = Sampling.byHash(b, "k", 0.3).as[Long].collect().toSet
    assert(s3 === s1)
    // lower fraction is a subset of higher (threshold monotonicity)
    val s4 = Sampling.byHash(a, "k", 0.1).as[Long].collect().toSet
    assert(s4.subsetOf(s1))
  }

  test("stratified rates per group; unlisted strata drop") {
    import spark.implicits._
    val df = spark.range(20000)
      .selectExpr("id AS k", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g")
    val out = Sampling.stratifiedByHash(df, "k", "g", Map("a" -> 0.5))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(!out.contains("b"))
    assert(math.abs(out("a") - 5000) < 500, s"stratum rate off: $out")
  }

  test("stratified keep-decision is EXACTLY hash < threshold(f) — boundary-tight") {
    import spark.implicits._
    // stratifiedByHash must agree with the independently-computed
    // strict-< comparison against Sampling.threshold(f) on EVERY row,
    // including rows whose hash sits at threshold−1 / threshold (the
    // 26-ulp double-vs-DECIMAL gap the round-5 verdict flagged). The
    // thresholds are long literals resolved on the driver, so this is
    // the same arithmetic the oracle SQL interpolates.
    val fracs = Map("a" -> 0.6, "b" -> 0.2, "c" -> 1.0, "d" -> 0.0)
    val df = spark.range(30000)
      .selectExpr("CAST(id AS STRING) AS k",
        "element_at(array('a','b','c','d'), CAST(id % 4 AS INT) + 1) AS g")
    val kept = Sampling.stratifiedByHash(df, "k", "g", fracs)
      .select("k").as[String].collect().toSet
    val expected = df
      .withColumn("h", graft.dedup.Shingles.baseHash(org.apache.spark.sql.functions.col("k")))
      .as[(String, String, Long)].collect()
      .collect { case (k, g, h) if h < Sampling.threshold(fracs(g)) => k }
      .toSet
    assert(kept === expected)
    // and the byHash single-fraction path uses the identical threshold
    val one = Sampling.byHash(df.toDF(), "k", 0.6).select("k").as[String].collect().toSet
    val oneExp = df
      .withColumn("h", graft.dedup.Shingles.baseHash(org.apache.spark.sql.functions.col("k")))
      .as[(String, String, Long)].collect()
      .collect { case (k, _, h) if h < Sampling.threshold(0.6) => k }.toSet
    assert(one === oneExp)
  }

  test("splitByHash: exhaustive+disjoint bands; growing a band never steals from earlier ones") {
    import spark.implicits._
    val df = spark.range(20000).selectExpr("CAST(id AS STRING) AS k")
    val bands = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s = Sampling.splitByHash(df, "k", bands)
      .select("k", "split").as[(String, String)].collect().toMap
    // fractions sum to 1 -> every row assigned, proportions roughly hold
    assert(s.size === 20000 && s.values.forall(_ != null))
    val counts = s.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 16000) < 500, counts.toString)
    assert(math.abs(counts("val") - 2000) < 300, counts.toString)
    // the held-out-set contract: growing train 0.8 -> 0.85 only ABSORBS
    // rows (from val, then transitively test); no row ever leaves an
    // earlier band, so no test row can leak INTO training history
    val grown = Sampling.splitByHash(df, "k",
      Seq("train" -> 0.85, "val" -> 0.1, "test" -> 0.05))
      .select("k", "split").as[(String, String)].collect().toMap
    s.foreach { case (k, b) =>
      if (b == "train") assert(grown(k) == "train", s"train row $k moved to ${grown(k)}")
      if (grown(k) == "test") assert(b == "test", s"row $k LEAKED from $b into test")
    }
    // fractions summing under 1 leave the remainder unassigned
    val partial = Sampling.splitByHash(df, "k", Seq("train" -> 0.5))
      .select("split").as[String].collect()
    assert(partial.count(_ == null) > 9000 && partial.count(_ == "train") > 9000)
    // joinable: splitting a DIFFERENT table by the same key space gives
    // the same assignment per key (the correlated-split property)
    val other = spark.range(20000).selectExpr("CAST(id AS STRING) AS k", "id AS payload")
    val s2 = Sampling.splitByHash(other, "k", bands)
      .select("k", "split").as[(String, String)].collect().toMap
    assert(s2 === s)
  }
}
