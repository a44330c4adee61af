package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-file column statistics for manifest-level data skipping — the
  * Delta/Iceberg "stats in the commit log" idea: each data file's
  * min/max/null-count per column is harvested from its parquet FOOTER
  * at commit time (metadata-only read, no data scan), persisted next to
  * the manifests, and queries prune the file list BEFORE the engine
  * scan by rewriting their predicate into a "can this file possibly
  * match" test over (min, max, nulls).
  *
  * At 100 TB the prune runs as a Spark filter over the stats table
  * (one row per file), so skipping scales with file COUNT, never data
  * size; a selective predicate turns a full-table scan into reading a
  * handful of files. Files with no stats row (or a NULL bound) are
  * always kept — skipping is an over-approximation, never a filter.
  *
  * The reference platform gets this from Delta's add-file stats; this
  * is the plain-Spark re-derivation (SURVEY.md §2.1 S4's commit-log
  * layering).
  */
object FileStats {

  /** Columns eligible for skipping stats. Timestamps ride along when
    * parquet wrote them as INT64 micros (Spark's TIMESTAMP_MICROS);
    * INT96 footers carry no usable stats and degrade to NULL = no skip.
    */
  private def supported(f: StructField): Boolean = f.dataType match {
    case IntegerType | LongType | FloatType | DoubleType | StringType |
         DateType | TimestampType | TimestampNTZType | ShortType | ByteType => true
    case _ => false
  }

  /** Wide stats schema for a table schema: one row per file,
    * `min_<c>`/`max_<c>` in the column's own type so predicate
    * rewriting stays typed, plus null and row counts.
    */
  def statsSchema(table: StructType): StructType = {
    val per = table.fields.filter(supported).flatMap { f =>
      Seq(StructField(s"min_${f.name}", f.dataType),
        StructField(s"max_${f.name}", f.dataType),
        StructField(s"nulls_${f.name}", LongType))
    }
    StructType(StructField("file", StringType) +:
      StructField("num_rows", LongType) +: per.toSeq)
  }

  /** Read one parquet footer and produce the file's stats row values
    * keyed by table column name: (min, max, nullCount). Conservative
    * throughout: anything surprising becomes NULL (= keep the file).
    */
  private def footerStats(
      conf: Configuration, absPath: String, table: StructType)
      : (Long, Map[String, (Any, Any, Any)]) = {
    val wanted = table.fields.filter(supported).map(f => f.name -> f.dataType).toMap
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(absPath), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRows = blocks.map(_.getRowCount).sum
      // aggregate chunk stats across row groups per top-level column
      val acc = scala.collection.mutable.Map.empty[String, (Any, Any, Long, Boolean)]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val pathParts = c.getPath.toArray
        if (pathParts.length == 1 && wanted.contains(pathParts(0))) {
          val name = pathParts(0)
          val dt = wanted(name)
          val st = c.getStatistics
          val valid = st != null && !st.isEmpty && st.isNumNullsSet
          val (mn, mx, ok) =
            if (valid && st.hasNonNullValue)
              (convert(st.genericGetMin, dt), convert(st.genericGetMax, dt), true)
            else if (valid) (null, null, true) // all-null chunk: bounds stay absent but COUNT is known
            else (null, null, false)
          val nulls = if (valid) st.getNumNulls else 0L
          acc.get(name) match {
            case None => acc(name) = (mn, mx, nulls, ok)
            case Some((pmn, pmx, pn, pok)) =>
              acc(name) = (minOf(pmn, mn), maxOf(pmx, mx), pn + nulls, pok && ok)
          }
        }
      }
      val out = acc.toMap.map { case (name, (mn, mx, nulls, ok)) =>
        // a single stats-less chunk poisons the whole file's bounds
        name -> (if (ok) (mn, mx, nulls: Any) else (null, null, null))
      }
      (numRows, out)
    } finally reader.close()
  }

  /** Parquet footer value → Spark external value (typed like the stats
    * schema column). NULL when the conversion isn't trustworthy.
    */
  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (i: java.lang.Integer, IntegerType) => i
    case (i: java.lang.Integer, ShortType) => i.shortValue()
    case (i: java.lang.Integer, ByteType) => i.byteValue()
    case (l: java.lang.Long, LongType) => l
    case (f: java.lang.Float, FloatType) => f
    case (d: java.lang.Double, DoubleType) => d
    // widening promotions: a narrow file harvested under a WIDENED
    // table schema (post type-widening) upcasts losslessly
    case (i: java.lang.Integer, LongType) => i.longValue()
    case (f: java.lang.Float, DoubleType) => f.doubleValue()
    case (b: org.apache.parquet.io.api.Binary, StringType) =>
      val s = b.toStringUsingUTF8
      // parquet orders binaries by unsigned bytes; that matches
      // String ordering only for ASCII — degrade to NULL otherwise
      if (s.forall(_ < 128)) s else null
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) => // TIMESTAMP_MICROS
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L))
    case (l: java.lang.Long, TimestampNTZType) => // INT64 micros, no zone
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case _ => null
  }

  private def cmp(a: Any, b: Any): Int =
    a.asInstanceOf[Comparable[Any]].compareTo(b)
  private def minOf(a: Any, b: Any): Any =
    if (a == null || b == null) null else if (cmp(a, b) <= 0) a else b
  private def maxOf(a: Any, b: Any): Any =
    if (a == null || b == null) null else if (cmp(a, b) >= 0) a else b

  /** Stats rows (statsSchema layout) for the given (manifest-relative
    * name, absolute path) files — footer reads only.
    */
  def collect(
      spark: SparkSession, table: StructType,
      files: Seq[(String, String)]): DataFrame = {
    val schema = statsSchema(table)
    val conf = spark.sparkContext.hadoopConfiguration
    val statCols = table.fields.filter(supported).map(_.name)
    val rows: Seq[Row] = files.map { case (rel, abs) =>
      val (numRows, byCol) = footerStats(conf, abs, table)
      val per = statCols.flatMap { c =>
        val (mn, mx, nulls) = byCol.getOrElse(c, (null, null, null))
        Seq(mn, mx, nulls)
      }
      Row.fromSeq(rel +: (numRows: Any) +: per.toSeq)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Rewrite a data predicate into its file-level "possibly matches"
    * over-approximation over the stats columns. Unrecognized shapes
    * become TRUE (keep), every leaf is NULL-tolerant (missing stats
    * keep), so pruning can only ever remove files that provably cannot
    * contain a matching row.
    */
  def pruneExpr(filter: Expression, statCols: Set[String]): Expression = {
    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference if statCols.contains(a.name) => Some(a.name)
      case u: UnresolvedAttribute if u.nameParts.length == 1 &&
        statCols.contains(u.nameParts.head) => Some(u.nameParts.head)
      case _ => None
    }
    // a monotone (order-preserving) cast maps [min, max] to valid
    // bounds, so a cast the analyzer wrapped around the column can be
    // re-applied to the stats columns instead of defeating the match
    def monotoneCast(from: DataType, to: DataType): Boolean = (from, to) match {
      case (TimestampNTZType, TimestampType) | (TimestampType, TimestampNTZType) => true
      case (DateType, TimestampType) | (DateType, TimestampNTZType) => true
      case (f: NumericType, t: NumericType) =>
        // widening numeric casts are monotone non-decreasing
        Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
          .indexOf(f) <= Seq(ByteType, ShortType, IntegerType, LongType,
            FloatType, DoubleType).indexOf(t) || t.isInstanceOf[DecimalType]
      case _ => false
    }
    /** The column (possibly under a monotone cast), carrying the
      * wrapper that re-applies the cast to a stats bound column.
      */
    case class BoundRef(col: String, wrap: Expression => Expression)
    def ref(e: Expression): Option[BoundRef] = e match {
      case a if attrName(a).isDefined => Some(BoundRef(attrName(a).get, identity))
      case c @ Cast(inner, to, _, _) if attrName(inner).isDefined &&
        monotoneCast(inner.dataType, to) =>
        Some(BoundRef(attrName(inner).get, x => c.withNewChildren(Seq(x))))
      case _ => None
    }
    def mnx(r: BoundRef): (Expression, Expression) =
      (r.wrap(UnresolvedAttribute.quoted(s"min_${r.col}")),
        r.wrap(UnresolvedAttribute.quoted(s"max_${r.col}")))
    def nulls(c: String) = UnresolvedAttribute.quoted(s"nulls_$c")
    def keepIfUnknown(e: Expression): Expression =
      Coalesce(Seq(e, Literal.TrueLiteral))
    def eqPossible(r: BoundRef, l: Literal): Expression = {
      val (mn, mx) = mnx(r)
      keepIfUnknown(And(LessThanOrEqual(mn, l), GreaterThanOrEqual(mx, l)))
    }

    object R {
      def unapply(e: Expression): Option[BoundRef] = ref(e)
    }
    def go(e: Expression): Expression = e match {
      case And(l, r) => And(go(l), go(r))
      case Or(l, r) => Or(go(l), go(r))
      case EqualTo(R(r), l: Literal) => eqPossible(r, l)
      case EqualTo(l: Literal, R(r)) => eqPossible(r, l)
      case EqualNullSafe(R(r), l: Literal) if l.value != null => eqPossible(r, l)
      case EqualNullSafe(l: Literal, R(r)) if l.value != null => eqPossible(r, l)
      case GreaterThan(R(r), l: Literal) =>
        keepIfUnknown(GreaterThan(mnx(r)._2, l))
      case GreaterThan(l: Literal, R(r)) =>
        keepIfUnknown(LessThan(mnx(r)._1, l))
      case GreaterThanOrEqual(R(r), l: Literal) =>
        keepIfUnknown(GreaterThanOrEqual(mnx(r)._2, l))
      case GreaterThanOrEqual(l: Literal, R(r)) =>
        keepIfUnknown(LessThanOrEqual(mnx(r)._1, l))
      case LessThan(R(r), l: Literal) =>
        keepIfUnknown(LessThan(mnx(r)._1, l))
      case LessThan(l: Literal, R(r)) =>
        keepIfUnknown(GreaterThan(mnx(r)._2, l))
      case LessThanOrEqual(R(r), l: Literal) =>
        keepIfUnknown(LessThanOrEqual(mnx(r)._1, l))
      case LessThanOrEqual(l: Literal, R(r)) =>
        keepIfUnknown(GreaterThanOrEqual(mnx(r)._2, l))
      case In(R(r), vs) if vs.nonEmpty &&
        vs.forall(v => v.isInstanceOf[Literal] && v.asInstanceOf[Literal].value != null) =>
        val lits = vs.map(_.asInstanceOf[Literal])
        if (lits.size <= 128) {
          // balanced, not reduceLeft: a runtime IN (dynamic file
          // pruning hands over the build side's key set) can carry
          // hundreds of values, and a left-deep OR chain overflows the
          // stack in every later tree traversal. 128, not 512: each
          // per-value range term compiles to ~30 lines of generated
          // Java, and a ~450-term tree blows janino's 64 KB method
          // limit — the stats Project then runs INTERPRETED with an
          // ERROR logged per scan (measured on the IVF re-rank fetch,
          // whose candidate sets sit in the 300–2000 range). Above
          // 128 the envelope below prunes by range and blooms prune
          // by value — sound, constant-size code, zero fallbacks.
          def orTree(es: Seq[Expression]): Expression =
            if (es.size == 1) es.head
            else {
              val (l, rr) = es.splitAt(es.size / 2)
              Or(orTree(l), orTree(rr))
            }
          orTree(lits.map(eqPossible(r, _)))
        } else {
          // wide IN: collapse to the values' [min, max] envelope —
          // sound (only ever keeps more files), constant-size, and the
          // bloom phase still probes every value exactly on
          // point-indexed columns
          val dt = lits.head.dataType
          val (mn, mx) = mnx(r)
          val loVal = Literal(Least(lits).eval(), dt)
          val hiVal = Literal(Greatest(lits).eval(), dt)
          keepIfUnknown(And(LessThanOrEqual(mn, hiVal),
            GreaterThanOrEqual(mx, loVal)))
        }
      case IsNull(a) if attrName(a).isDefined =>
        keepIfUnknown(GreaterThan(nulls(attrName(a).get), Literal(0L)))
      // IS NOT NULL prunes all-null files (nulls == num_rows)
      case IsNotNull(a) if attrName(a).isDefined =>
        keepIfUnknown(LessThan(nulls(attrName(a).get),
          UnresolvedAttribute.quoted("num_rows")))
      // != prunes only constant files pinned to exactly that value
      case Not(EqualTo(R(r), l: Literal)) =>
        val (mn, mx) = mnx(r)
        keepIfUnknown(Not(And(EqualTo(mn, l), EqualTo(mx, l))))
      case Not(EqualTo(l: Literal, R(r))) =>
        val (mn, mx) = mnx(r)
        keepIfUnknown(Not(And(EqualTo(mn, l), EqualTo(mx, l))))
      // LIKE 'p%' ⇒ the file's range must intersect [p, next(p)): a
      // string starting with p is >= p and < p-with-last-char-bumped
      // (Delta's startsWith skipping). Bail to TRUE when the prefix
      // can't be bumped (empty / last char at max) — rare and safe.
      case StartsWith(R(r), l @ Literal(_, StringType)) if l.value != null =>
        prefixPossible(r, l.value.toString)
      // the ANALYZED (unoptimized) tree keeps LIKE 'p%' as Like — the
      // same prefix bound applies when the pattern has no other
      // wildcards or escapes
      case Like(R(r), l @ Literal(_, StringType), escape) if l.value != null &&
        l.value.toString.endsWith("%") &&
        !l.value.toString.dropRight(1).exists(c =>
          c == '%' || c == '_' || c == escape) =>
        prefixPossible(r, l.value.toString.dropRight(1))
      case _ => Literal.TrueLiteral
    }
    def prefixPossible(r: BoundRef, prefix: String): Expression =
      prefixUpperBound(prefix) match {
        case Some(next) =>
          val (mn, mx) = mnx(r)
          keepIfUnknown(And(
            GreaterThanOrEqual(mx, Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(prefix), StringType)),
            LessThan(mn, Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(next), StringType))))
        case None => Literal.TrueLiteral
      }
    go(filter)
  }

  /** Smallest string strictly greater than every string with prefix
    * `p`: bump the last bumpable char and truncate. None when no char
    * can be bumped (keeps the file — pruning stays conservative).
    * Restricted to ASCII-bumpable tails because the stats harvest only
    * trusts ASCII string bounds (see [[convert]]).
    */
  private def prefixUpperBound(p: String): Option[String] = {
    val i = p.lastIndexWhere(c => c < 127)
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  /** Analyze `filter` against an empty frame of the DATA schema and
    * fold foldables into typed Literals. A Spark 4 `Column` is a
    * ColumnNode tree, not catalyst — analysis produces the typed-
    * literal/cast-inserted catalyst tree both [[pruneExpr]] and
    * [[BloomIndex.pointTargets]] pattern-match, so one analysis pass
    * per filter serves both. Any trouble (e.g. a column outside the
    * schema) degrades to TRUE = no pruning from this filter.
    */
  def analyzedCondition(
      spark: SparkSession, dataSchema: StructType, filter: Column): Expression =
    try {
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[Row](), dataSchema)
      val analyzed = empty.filter(filter).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.getOrElse(Literal.TrueLiteral)
      // analysis inserts casts but never folds them — fold here so
      // `cast('2024-05-01' as date)` matches the Literal patterns
      analyzed.transformUp {
        case e if e.foldable && !e.isInstanceOf[Literal] =>
          Literal.create(e.eval(null), e.dataType)
      }
    } catch { case scala.util.control.NonFatal(_) => Literal.TrueLiteral }

  /** Column-facing wrapper over [[pruneExpr]]. */
  def pruneColumn(
      spark: SparkSession, dataSchema: StructType,
      filter: Column, statCols: Set[String]): Column =
    ColumnBridge.column(
      pruneExpr(analyzedCondition(spark, dataSchema, filter), statCols))
}
