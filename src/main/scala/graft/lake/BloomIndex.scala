package graft.lake

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, In}
import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StructType

/** Per-file BLOOM FILTERS for manifest-level data skipping on point
  * lookups — Delta's bloom filter index, re-derived over the stats-store
  * design of [[FileStats]].
  *
  * Min/max stats prune RANGE predicates, but an equality lookup on a
  * high-cardinality column whose values spread uniformly (ids, hashes,
  * uuids) matches every file's [min, max] — the scan stays O(table). A
  * per-file bloom filter answers "can file F contain value v?" with no
  * false negatives, so `WHERE id = v` reads the one file holding v plus
  * an fpp-bounded handful of false positives, independent of table
  * size. Build cost is one pass over the NEWLY WRITTEN batch at commit
  * time (opt-in per table, like Delta's index config); probe cost is a
  * filter over one (file, col) row per file — metadata scale.
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * (the runtime row-level-filtering machinery) with the same
  * `XxHash64` hashing on both sides, so build and probe can never
  * disagree on encoding.
  */
object BloomIndex {

  /** False-positive target per file: 3% keeps the per-file filter at
    * ~7.3 bits/row; a point lookup on a 1000-file table reads ~1 + 30
    * files instead of 1000.
    */
  private val Fpp = 0.03

  /** Bits cap per (file, column) filter — 1 MiB serialized. Files with
    * more rows than the cap supports degrade to a higher fpp, never to
    * a wrong answer.
    */
  private val MaxBits = 1L << 23

  private def xxhash(e: Expression): Expression = new XxHash64(Seq(e))

  /** Build (file, col, bloom) rows for the given columns over the given
    * data files — ONE grouped-aggregate job over the new batch (plus a
    * zero-column count pass to size the filters). File names are
    * manifest-relative: everything after the last `/data/` in the scan
    * path (the same reduction deletion vectors use), computed as a
    * column expression so no driver state rides the closure.
    */
  def build(
      spark: SparkSession, schema: StructType, paths: Seq[String],
      cols: Seq[String]): DataFrame = {
    val present = cols.filter(c => schema.fieldNames.contains(c))
    require(present.nonEmpty && paths.nonEmpty,
      "BloomIndex.build needs at least one indexed column and one file")
    val data = spark.read.schema(schema).parquet(paths: _*)
      .withColumn("__file", input_file_name())
    // size for the fattest file in the batch (numBits is one literal
    // for the whole aggregate); zero data columns read — cheap
    val maxRowsRow = data.groupBy(col("__file")).count()
      .agg(org.apache.spark.sql.functions.max("count")).head
    // a staged EMPTY batch (e.g. an empty streaming micro-batch) still
    // writes one metadata-only parquet file; max(count) is then NULL —
    // there is nothing to index, so return an empty store slice rather
    // than failing the whole commit on the NULL aggregate
    if (maxRowsRow.isNullAt(0)) {
      import spark.implicits._
      return Seq.empty[(String, String, Array[Byte])]
        .toDF("file", "col", "bloom")
    }
    val maxRows = maxRowsRow.getLong(0)
    val numBits = math.min(MaxBits,
      math.max(64L, org.apache.spark.util.sketch.BloomFilter
        .optimalNumOfBits(maxRows, Fpp)))
    val aggs = present.map { c =>
      ColumnBridge.column(new BloomFilterAggregate(
        xxhash(ColumnBridge.expression(col(c))),
        Literal(maxRows), Literal(numBits)).toAggregateExpression())
        .as(s"__bloom_$c")
    }
    val wide = data.groupBy(col("__file")).agg(aggs.head, aggs.tail: _*)
    // long form (file, col, bloom): survives schema evolution — adding
    // a bloom column later doesn't rewrite old rows
    present.map { c =>
      wide.select(
        org.apache.spark.sql.functions.expr(
          "substring_index(__file, '/data/', -1)").as("file"),
        org.apache.spark.sql.functions.lit(c).as("col"),
        col(s"__bloom_$c").as("bloom"))
    }.reduce(_ unionByName _)
  }

  /** Equality/IN point-lookup targets per bloom column from the
    * TOP-LEVEL CONJUNCTS of pre-analyzed filter conditions (one
    * analysis pass per filter is shared with the stats rewrite — see
    * [[FileStats.analyzedCondition]]). A disjunct like `c = 5 OR d = 7`
    * cannot prune on c alone and is skipped. Each returned entry is one
    * conjunct: the file must possibly contain AT LEAST ONE of the
    * listed values.
    */
  def pointTargets(
      conds: Seq[Expression], bloomCols: Set[String]): Seq[(String, Seq[Literal])] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def attr(e: Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
        if bloomCols.contains(a.name) => Some(a.name)
      case _ => None
    }
    conds.flatMap { analyzed =>
      conjuncts(analyzed).flatMap {
        case EqualTo(a, l: Literal) if attr(a).isDefined && l.value != null =>
          Some(attr(a).get -> Seq(l))
        case EqualTo(l: Literal, a) if attr(a).isDefined && l.value != null =>
          Some(attr(a).get -> Seq(l))
        case EqualNullSafe(a, l: Literal) if attr(a).isDefined && l.value != null =>
          Some(attr(a).get -> Seq(l))
        case EqualNullSafe(l: Literal, a) if attr(a).isDefined && l.value != null =>
          Some(attr(a).get -> Seq(l))
        case In(a, vs) if attr(a).isDefined && vs.nonEmpty &&
          vs.forall(v => v.isInstanceOf[Literal] &&
            v.asInstanceOf[Literal].value != null) =>
          Some(attr(a).get -> vs.map(_.asInstanceOf[Literal]))
        case _ => None
      }
    }
  }

  /** Files from `all` that CANNOT contain any required value, per the
    * bloom store (file, col, bloom). Missing rows / null blooms keep
    * the file; only provable misses are removed.
    *
    * `BloomFilterMightContain` insists its filter side be a constant
    * (it exists for runtime filters), so the probe instead hashes the
    * literals driver-side with the SAME `XxHash64` the build used and
    * deserializes each per-file sketch where its row lives — a
    * metadata-scale pass over one row per (file, indexed column).
    */
  def pruned(
      spark: SparkSession, blooms: DataFrame, all: Seq[String],
      targets: Seq[(String, Seq[Literal])]): Set[String] = {
    if (targets.isEmpty) return Set.empty
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    // col -> conjuncts -> candidate value hashes (file possible iff
    // EVERY conjunct has SOME possibly-contained value)
    val hashes: Map[String, Seq[Seq[Long]]] = targets.groupBy(_._1)
      .map { case (c, conj) =>
        c -> conj.map(_._2.map(l => xxhash(l).eval(null).asInstanceOf[Long]))
      }
    blooms
      .join(broadcast(all.toDF("file")), Seq("file"), "left_semi")
      .select(col("file"), col("col"), col("bloom"))
      .as[(String, String, Array[Byte])]
      .flatMap { case (f, c, b) =>
        hashes.get(c) match {
          case Some(conjs) if b != null =>
            val bf = org.apache.spark.util.sketch.BloomFilter
              .readFrom(new java.io.ByteArrayInputStream(b))
            if (conjs.forall(_.exists(bf.mightContainLong))) None else Some(f)
          case _ => None
        }
      }
      .collect().toSet
  }
}
