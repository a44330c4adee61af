package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, KnownNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.IncrementalView

/** TRANSPARENT MATERIALIZED-VIEW ROUTING — the optimizer half of
  * [[graft.lake.IncrementalView]]: a `GROUP BY` aggregate over a graft
  * source table is rewritten to a SCAN of a registered view when the
  * view is FRESH (its watermark == the source's head version) and its
  * definition matches the query's shape exactly. At 100 TB this turns
  * a full-source aggregation into a read of the (orders-of-magnitude
  * smaller) pre-aggregated table — the serving half of incremental
  * view maintenance; Databricks/BigQuery/Oracle all pair maintenance
  * with exactly this rewrite.
  *
  * Opt-in per view ([[GraftViewRouting.register]]), conservative by
  * construction: any mismatch — different group set, an aggregate the
  * view doesn't carry, a Filter touching non-group columns (a filter
  * on GROUP columns only routes, re-targeted at the view's key
  * columns — aggregate-after-filter ≡ filter-after-aggregate there),
  * a time-traveled read, a stale watermark, a dtype disagreement —
  * just leaves the plan untouched. Freshness is checked at OPTIMIZATION
  * time (one manifest-hint read), so each action sees the view iff it
  * still reflects the source head at that moment.
  *
  * Matching is NAME+SQL-canonical: grouping expressions must be bare
  * columns equal (case-insensitive) to the view's group set, and each
  * aggregate output's canonical SQL must equal one of the view's
  * stored aggregate SQLs after normalization (`count(*)`≡`count(1)`,
  * case/backtick/whitespace-insensitive). String-level matching can
  * only FAIL CLOSED: a miss keeps the original plan.
  */
object GraftViewRouting {

  private val registry = new ConcurrentHashMap[String, Set[String]]()
  private val opened = new ConcurrentHashMap[String, IncrementalView]()
  private val joinRegistry = new ConcurrentHashMap[String, Set[String]]()
  private val joinOpened =
    new ConcurrentHashMap[String, graft.lake.IncrementalJoinView]()

  /** Scheme-insensitive path key (file:/tmp/x ≡ /tmp/x). */
  private[plans] def normalize(p: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    if (u.getScheme == null || u.getScheme == "file") u.getPath
    else p.stripSuffix("/")
  }

  /** Enable routing for the view at `viewPath` (validates it opens). */
  def register(spark: SparkSession, viewPath: String): Unit = {
    val v = IncrementalView.open(spark, viewPath)
    opened.put(viewPath, v)
    registry.merge(normalize(v.source.path), Set(viewPath), _ ++ _)
  }

  def unregister(viewPath: String): Unit = {
    Option(opened.remove(viewPath)).foreach { v =>
      registry.computeIfPresent(normalize(v.source.path),
        (_, s) => { val r = s - viewPath; if (r.isEmpty) null else r })
    }
    Option(joinOpened.remove(viewPath)).foreach { v =>
      joinRegistry.computeIfPresent(normalize(v.fact.path),
        (_, s) => { val r = s - viewPath; if (r.isEmpty) null else r })
    }
  }

  /** Enable routing for the JOIN view at `viewPath` (star-schema
    * aggregates rewrite to its scan — see [[RouteAggregatesToViews]]).
    */
  def registerJoin(spark: SparkSession, viewPath: String): Unit = {
    val v = graft.lake.IncrementalJoinView.open(spark, viewPath)
    joinOpened.put(viewPath, v)
    joinRegistry.merge(normalize(v.fact.path), Set(viewPath), _ ++ _)
  }

  def clear(): Unit = {
    registry.clear(); opened.clear(); joinRegistry.clear(); joinOpened.clear()
    discoveredFor.clear()
  }

  // ---- persistent discovery: registration is session state, but the
  // view DEFINITIONS are not — every view carries a `_viewdef` sidecar
  // (source path + strategy + shape). A fresh session — the normal
  // BI-dashboard situation — must not silently pay O(fact) until
  // someone re-registers by hand, so the routing rule re-attaches
  // registrations by scanning for those sidecars: every directory in
  // `spark.graft.viewRouting.discoverPaths` (comma-separated; listing
  // a path IS the opt-in) and, under the existing
  // `spark.graft.viewRouting.autoRegister` opt-in, the warehouse of
  // every configured graft catalog. Discovery runs once per
  // (session, conf value) — a memoized no-op on every later
  // optimization pass. ----

  // keyed on the SESSION OBJECT through a WeakHashMap: identity
  // semantics without identityHashCode collisions (two live sessions
  // can share a hash; a dead session's address can be reused), and
  // entries for GC'd sessions evict themselves. The value is the set
  // of conf fingerprints already discovered for that session.
  private val discoveredFor =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap.KeySetView[String, java.lang.Boolean]]())

  /** Scan `dir` (bounded depth) for graft view tables — directories
    * carrying a `_viewdef` sidecar — and register each with the
    * routing rule, dispatching join views by their era marker.
    * Non-view graft tables are recognized by their `_log` and not
    * descended into; a sidecar that fails to open (era mismatch,
    * vacuumed table) is skipped — discovery can only fail open to the
    * unrouted plan, never break a query. Returns the registered count.
    */
  def discover(spark: SparkSession, dir: String, maxDepth: Int = 4): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    var n = 0
    def walk(p: org.apache.hadoop.fs.Path, depth: Int): Unit = {
      if (fs.exists(new org.apache.hadoop.fs.Path(p, "_viewdef"))) {
        try {
          if (graft.lake.IncrementalJoinView.isJoinView(spark, p.toString))
            registerJoin(spark, p.toString)
          else register(spark, p.toString)
          n += 1
        } catch { case _: Exception => () }
      } else if (depth < maxDepth &&
        !fs.exists(new org.apache.hadoop.fs.Path(p, "_log"))) {
        // not a table: a warehouse/namespace directory — descend
        try fs.listStatus(p).filter(_.isDirectory)
          .map(_.getPath)
          .filterNot { c =>
            c.getName.startsWith("_") || c.getName.startsWith(".") }
          .foreach(walk(_, depth + 1))
        catch { case _: Exception => () }
      }
    }
    walk(root, 0)
    n
  }

  /** The warehouse directories of every graft catalog configured on
    * this session (`spark.sql.catalog.<name>` = GraftCatalog).
    */
  private def graftWarehouses(spark: SparkSession): Seq[String] = {
    val all = spark.conf.getAll
    val catalogRe = """^spark\.sql\.catalog\.([^.]+)$""".r
    all.toSeq.collect {
      case (catalogRe(name), cls)
          if cls == classOf[graft.sources.GraftCatalog].getName =>
        all.get(s"spark.sql.catalog.$name.warehouse")
    }.flatten.sorted
  }

  /** Once per (session, conf): re-attach registrations from disk. The
    * memo key deliberately excludes the warehouse LIST (enumerating it
    * costs a full `conf.getAll` — too heavy for every optimizer pass):
    * a catalog registered after this session's first discovery is
    * picked up by its own CREATE/REFRESH auto-register, an explicit
    * `register`, or the next session.
    */
  private[plans] def maybeDiscover(spark: SparkSession): Unit = {
    val explicit = spark.conf.get("spark.graft.viewRouting.discoverPaths", "")
    val autoReg = spark.conf
      .get("spark.graft.viewRouting.autoRegister", "false").toBoolean
    if (explicit.isEmpty && !autoReg) return
    val done = discoveredFor.synchronized {
      var s = discoveredFor.get(spark)
      if (s == null) {
        s = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
        discoveredFor.put(spark, s)
      }
      s
    }
    if (!done.add(explicit + "|" + autoReg)) return
    val wh = if (autoReg) graftWarehouses(spark) else Nil
    (explicit.split(",").toSeq.map(_.trim).filter(_.nonEmpty) ++ wh)
      .distinct.foreach(discover(spark, _))
  }

  private[plans] def isEmpty: Boolean =
    registry.isEmpty && joinRegistry.isEmpty

  private[plans] def viewsFor(srcPath: String): Seq[IncrementalView] =
    registry.getOrDefault(normalize(srcPath), Set.empty).toSeq.sorted
      .flatMap(p => Option(opened.get(p)))

  private[plans] def joinViewsFor(factPath: String): Seq[graft.lake.IncrementalJoinView] =
    joinRegistry.getOrDefault(normalize(factPath), Set.empty).toSeq.sorted
      .flatMap(p => Option(joinOpened.get(p)))

  /** Canonical form for agg-SQL comparison; misses only fail closed. */
  private[plans] def norm(sql: String): String =
    sql.toLowerCase(java.util.Locale.ROOT)
      .replace("`", "").replaceAll("\\s+", "")
      .replace("count(*)", "count(1)")

  /** [[norm]] of an expression with attribute QUALIFIERS stripped
    * first: catalog-SQL plans carry qualified attributes whose `.sql`
    * renders `sum(cat.tbl.v)` — which would never match a view's
    * declared `sum(v)`. Stripping at the EXPRESSION level (not
    * textually) keeps struct-field accesses (`s.v`) distinct from
    * bare columns.
    */
  private[plans] def normExpr(e: Expression): String =
    norm(e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql)
}

/** The injected rule (see [[GraftViewRouting]]); runs in the operator-
  * optimization batch, before DSv2 scan pushdown, so relations are
  * still [[DataSourceV2Relation]]s carrying their table handles.
  */
case class RouteAggregatesToViews(spark: SparkSession)
    extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.viewRouting.enabled", "true").toBoolean)
      return plan
    // re-attach persisted registrations before the emptiness check —
    // a fresh session serving a dashboard must find its views without
    // a manual register call (memoized: a no-op after the first pass)
    GraftViewRouting.maybeDiscover(spark)
    if (GraftViewRouting.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        tryRoute(agg).orElse(tryRouteJoin(agg)).getOrElse(agg)
    }
  }

  /** The backing table path of a graft HEAD scan, plus any Filter
    * conditions found on the way down (conjoined); None for anything
    * else (non-graft, time travel, column-mapped stubs, intermediate
    * operators).
    */
  private def graftHeadPath(p: LogicalPlan): Option[(String, Seq[Expression])] =
    p match {
      case SubqueryAlias(_, child) => graftHeadPath(child)
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        graftHeadPath(child)
      case Filter(cond, child) =>
        // split conjunctions: SQL queries arrive as ONE composite
        // Filter (`a AND b AND isnotnull(k)`), and the routable/
        // implied/foreign distinction is per-CONJUNCT
        graftHeadPath(child).map { case (path, fs) =>
          (path, splitConjunctivePredicates(cond) ++ fs) }
      case rel: DataSourceV2Relation =>
        rel.table match {
          case w: graft.sources.GraftWritableTable => Some((w.tablePath, Nil))
          case t if t.name().startsWith("graft:") &&
              rel.options.containsKey("path") &&
              !rel.options.containsKey("versionAsOf") &&
              !rel.options.containsKey("timestampAsOf") =>
            Some((rel.options.get("path"), Nil))
          case _ => None
        }
      case _ => None
    }

  private def tryRoute(agg: Aggregate): Option[LogicalPlan] = for {
    pathAndFilters <- graftHeadPath(agg.child)
    (srcPath, filters) = pathAndFilters
    groupNames <- bareGroupNames(agg.groupingExpressions)
    routed <- {
      // prefer an exact-group view (plain projection) over a rollup
      // re-aggregation over a finer-grained one
      val (exact, finer) = GraftViewRouting.viewsFor(srcPath)
        .filter(fresh)
        .map(v => v -> v.groupCols.map(_.toLowerCase).toSet)
        // a filter is routable iff it is DETERMINISTIC and touches VIEW
        // group columns only: then aggregate-after-filter ≡
        // filter-after-aggregate there. (A non-deterministic predicate
        // — rand() — references no columns at all, but dropping random
        // SOURCE rows is not dropping random GROUPS; it must never
        // re-target.)
        .filter { case (_, vg) =>
          filters.forall(f => f.deterministic &&
            f.references.forall(a => vg(a.name.toLowerCase)))
        }
        .partition { case (_, vg) => vg == groupNames }
      exact.view.flatMap { case (v, _) => rewrite(agg, v, filters) }
        .headOption
        .orElse(finer.view
          .filter { case (_, vg) => groupNames.subsetOf(vg) }
          .flatMap { case (v, _) => rewriteRollup(agg, v, filters) }
          .headOption)
    }
  } yield routed

  // ---- JOIN-VIEW routing: Aggregate over a left-deep star join of a
  // graft fact with graft dims rewrites to a scan of a registered
  // FRESH [[graft.lake.IncrementalJoinView]] whose dim chain (paths +
  // join keys, in join order), group set, and aggregate SQLs all
  // match. count(*) maps to the stored liveness count; sum(x) maps to
  // `nn > 0 ? acc : NULL`, restoring SQL sum's NULL contract from the
  // stored accumulator + non-null counter. A Filter anywhere in the
  // shape routes iff it references VIEW GROUP columns only — there
  // filter-then-aggregate ≡ aggregate-then-filter (every joined row
  // of a fine group shares the group values), so the filter re-targets
  // at the view's key columns, the same rule the plain-view path
  // applies; any other filter fails closed. This is THE dashboard
  // shape: `WHERE <dim-attr> GROUP BY <dim-attr>` over a star join
  // now reads O(view), not O(fact). ----

  /** The fact path + (dimPath, factKeyCol, dimKeyCol) chain of a
    * left-deep inner-equi-join of graft HEAD scans, plus every Filter
    * condition found anywhere in the shape (above the joins or at the
    * fact/dim leaves); None otherwise.
    */
  private[plans] def joinShape(p: LogicalPlan)
      : Option[(String, Seq[(String, String, String)], Seq[Expression])] = p match {
    case SubqueryAlias(_, child) => joinShape(child)
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      joinShape(child)
    case Filter(cond, child) =>
      joinShape(child).map { case (f, d, fs) =>
        (f, d, splitConjunctivePredicates(cond) ++ fs) }
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
      j.condition match {
        case Some(org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: AttributeReference, b: AttributeReference)) =>
          for {
            left <- joinShape(j.left)
            dimLeaf <- graftHeadPath(j.right)
            keys <- {
              val la = j.left.outputSet
              val ra = j.right.outputSet
              if (la.contains(a) && ra.contains(b)) Some((a.name, b.name))
              else if (la.contains(b) && ra.contains(a)) Some((b.name, a.name))
              else None
            }
          } yield (left._1, left._2 :+ ((dimLeaf._1, keys._1, keys._2)),
            left._3 ++ dimLeaf._2)
        case _ => None
      }
    case other => graftHeadPath(other).map { case (path, fs) => (path, Nil, fs) }
  }

  private[plans] def tryRouteJoin(agg: Aggregate): Option[LogicalPlan] = for {
    shape <- joinShape(agg.child)
    (factPath, dimChain, allFilters) = shape
    if dimChain.nonEmpty
    // `isnotnull(<join key>)` filters are IMPLIED by the inner
    // equi-join (null keys never join), and the optimizer infers them
    // onto the leaves (InferFiltersFromConstraints) for any SQL-written
    // star query — discard them before the group-column gate, or no
    // catalog-SQL star aggregate would ever route
    joinKeys = dimChain.flatMap { case (_, fk, dk) =>
      Seq(fk.toLowerCase, dk.toLowerCase) }.toSet
    filters = allFilters.filterNot {
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(
        a: AttributeReference) => joinKeys(a.name.toLowerCase)
      case _ => false
    }
    groupNames <- bareGroupNames(agg.groupingExpressions)
    routed <- {
      val candidates = GraftViewRouting.joinViewsFor(factPath)
        .filter { v =>
          v.dimSpecs.length == dimChain.length &&
            v.dimSpecs.zip(dimChain).forall { case (spec, (path, fk, dk)) =>
              GraftViewRouting.normalize(spec.path) ==
                GraftViewRouting.normalize(path) &&
                spec.factKey.equalsIgnoreCase(fk) &&
                spec.dimKey.equalsIgnoreCase(dk)
            }
        }
        // every filter must be DETERMINISTIC and reference VIEW group
        // columns only — then it commutes with the star aggregate and
        // re-targets at the view (same rand() trap as the plain path)
        .filter { v =>
          val vg = v.groupCols.map(_.toLowerCase).toSet
          filters.forall(f => f.deterministic &&
            f.references.forall(a => vg(a.name.toLowerCase)))
        }
        .filter(v => try v.isFresh catch { case _: Exception => false })
      // exact-group views serve by projection; a FINER view serves a
      // coarser GROUP BY by re-aggregation (LONG accumulators only —
      // the rollup dtype rule)
      candidates
        .filter(_.groupCols.map(_.toLowerCase).toSet == groupNames)
        .view.flatMap(v => rewriteJoin(agg, v, filters)).headOption
        .orElse(candidates
          .filter(v => groupNames.subsetOf(v.groupCols.map(_.toLowerCase).toSet))
          .view.flatMap(v => rewriteJoinRollup(agg, v, filters)).headOption)
    }
  } yield routed

  /** Coarser GROUP BY over a finer join view: the stored per-fine-group
    * rows re-aggregate — `count(*)`→`sum(cnt)`, `sum(x)`→`sum(acc)`
    * gated on `sum(nn) > 0` (acc is 0 where nn is 0, so the rolled
    * accumulator is exact), `avg(x)`→`sum(acc)/sum(nn)`. LONG
    * accumulators only: a decimal Sum widens the dtype and fails
    * closed, like the plain-view rollup.
    */
  private def rewriteJoinRollup(agg: Aggregate,
      view: graft.lake.IncrementalJoinView,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, EvalMode, GreaterThan, If, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Max, Min, Sum}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val viewRel = viewRelationAt(view.table.path).getOrElse(return None)
    val byName = viewRel.output.map(a => a.name.toLowerCase -> a).toMap
    val groupSet = agg.groupingExpressions
      .collect { case a: AttributeReference => a.name.toLowerCase }.toSet

    def pair(argN: String) = view.sumCols
      .find { case (_, arg) => GraftViewRouting.norm(arg) == argN }
      .flatMap { case (n, _) =>
        for {
          acc <- byName.get(n.toLowerCase) if acc.dataType == LongType
          nn <- byName.get(view.nnColName(n).toLowerCase)
        } yield (AggregateExpression(Sum(acc), Complete, isDistinct = false),
          AggregateExpression(Sum(nn), Complete, isDistinct = false))
      }

    /** max-of-maxes / min-of-mins over the fine groups IS the coarse
      * extreme (NULL fine extremes are skipped by Max/Min, matching
      * the unrouted plan's skip of all-NULL input).
      */
    def reExtreme(al: Alias, argN: String, isMax: Boolean) = view.extremeCols
      .find { case (_, arg, m) => m == isMax &&
        GraftViewRouting.norm(arg) == argN }
      .flatMap { case (n, _, _) => byName.get(n.toLowerCase) }
      .map(c => AggregateExpression(
        if (isMax) Max(c) else Min(c), Complete, isDistinct = false))
      .filter(_.dataType == al.dataType)
      .map(e => Alias(e, al.name)(exprId = al.exprId))

    val outs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val sqlN = GraftViewRouting.normExpr(ae)
        if (sqlN == "count(1)")
          byName.get(view.countCol.toLowerCase)
            .map(c => AggregateExpression(Sum(c), Complete, isDistinct = false))
            .filter(_.dataType == al.dataType)
            .map(s => Alias(KnownNotNull(s), al.name)(exprId = al.exprId))
        else if (sqlN.startsWith("count("))
          // count(x) rolls up as the SUM of the fine groups' stored
          // non-null counters (count is decomposable over a partition)
          pair(sqlN.stripPrefix("count(").stripSuffix(")"))
            .map { case (_, nnSum) => nnSum }
            .filter(_.dataType == al.dataType)
            .map(s => Alias(KnownNotNull(s), al.name)(exprId = al.exprId))
        else if (sqlN.startsWith("max(") || sqlN.startsWith("min("))
          reExtreme(al, sqlN.drop(4).stripSuffix(")"), sqlN.startsWith("max("))
        else if (sqlN.startsWith("sum(") && al.dataType == LongType)
          pair(sqlN.stripPrefix("sum(").stripSuffix(")")).map {
            case (accSum, nnSum) =>
              Alias(If(GreaterThan(nnSum, Literal(0L)), accSum,
                Literal(null, LongType)), al.name)(exprId = al.exprId)
          }
        else if (sqlN.startsWith("avg(") && al.dataType == DoubleType)
          pair(sqlN.stripPrefix("avg(").stripSuffix(")")).map {
            case (accSum, nnSum) =>
              Alias(If(GreaterThan(nnSum, Literal(0L)),
                Divide(Cast(accSum, DoubleType), Cast(nnSum, DoubleType),
                  EvalMode.LEGACY),
                Literal(null, DoubleType)), al.name)(exprId = al.exprId)
          }
        else None
      case a @ Alias(attr: AttributeReference, _)
          if groupSet(attr.name.toLowerCase) =>
        byName.get(attr.name.toLowerCase).filter(_.dataType == a.dataType)
          .map(va => Alias(va, a.name)(exprId = a.exprId))
      case attr: AttributeReference if groupSet(attr.name.toLowerCase) =>
        byName.get(attr.name.toLowerCase).filter(_.dataType == attr.dataType)
          .map(va => Alias(va, attr.name)(exprId = attr.exprId))
      case _ => None
    }
    if (outs.exists(_.isEmpty)) None
    else remapFilters(filters, byName).map { fs =>
      val base = fs.foldLeft(viewRel: LogicalPlan)((p, c) => Filter(c, p))
      val groups: Seq[Expression] = agg.groupingExpressions.collect {
        case a: AttributeReference => byName(a.name.toLowerCase)
      }
      Aggregate(groups, outs.flatten, base)
    }
  }

  private[plans] def rewriteJoin(agg: Aggregate,
      view: graft.lake.IncrementalJoinView,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, EvalMode, GreaterThan, If, Literal}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val viewRel = viewRelationAt(view.table.path).getOrElse(return None)
    val byName = viewRel.output.map(a => a.name.toLowerCase -> a).toMap
    val groupSet = view.groupCols.map(_.toLowerCase).toSet

    def mapGroup(orig: NamedExpression, name: String): Option[NamedExpression] =
      byName.get(name.toLowerCase).filter(_.dataType == orig.dataType)
        .map(va => Alias(va, orig.name)(exprId = orig.exprId))

    /** The stored (acc, nn) pair whose sum argument's canonical SQL is
      * `argN`; nn IS count(arg) — non-null inputs only, exactly avg's
      * denominator.
      */
    def accPair(argN: String) = view.sumCols
      .find { case (_, arg) => GraftViewRouting.norm(arg) == argN }
      .flatMap { case (n, _) =>
        for {
          acc <- byName.get(n.toLowerCase)
          nn <- byName.get(view.nnColName(n).toLowerCase)
        } yield (acc, nn)
      }

    /** The stored extreme column matching `fn(argN)` — served verbatim
      * (stored max/min IS the aggregate; NULL iff no non-null input).
      */
    def extremeCol(argN: String, isMax: Boolean) = view.extremeCols
      .find { case (_, arg, m) => m == isMax &&
        GraftViewRouting.norm(arg) == argN }
      .flatMap { case (n, _, _) => byName.get(n.toLowerCase) }

    val outs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val sqlN = GraftViewRouting.normExpr(ae)
        if (sqlN == "count(1)")
          byName.get(view.countCol.toLowerCase)
            .filter(_.dataType == al.dataType)
            .map(a => Alias(KnownNotNull(a), al.name)(exprId = al.exprId))
        else if (sqlN.startsWith("count("))
          // count(x) — non-null inputs only — IS the stored __nn_
          // counter that backs sum(x)/avg(x)
          accPair(sqlN.stripPrefix("count(").stripSuffix(")"))
            .map(_._2).filter(_.dataType == al.dataType)
            .map(nn => Alias(KnownNotNull(nn), al.name)(exprId = al.exprId))
        else if (sqlN.startsWith("sum("))
          accPair(sqlN.stripPrefix("sum(").stripSuffix(")"))
            .filter { case (acc, _) => acc.dataType == al.dataType }
            .map { case (acc, nn) =>
              Alias(If(GreaterThan(nn, Literal(0L)), acc,
                Literal(null, acc.dataType)), al.name)(exprId = al.exprId)
            }
        else if (sqlN.startsWith("max(") || sqlN.startsWith("min("))
          extremeCol(sqlN.drop(4).stripSuffix(")"), sqlN.startsWith("max("))
            .filter(_.dataType == al.dataType)
            .map(a => Alias(a, al.name)(exprId = al.exprId))
        else if (sqlN.startsWith("avg("))
          // LONG accumulators only — the rollup-avg bit-equality rule
          accPair(sqlN.stripPrefix("avg(").stripSuffix(")"))
            .filter { case (acc, _) =>
              acc.dataType == LongType && al.dataType == DoubleType }
            .map { case (acc, nn) =>
              Alias(If(GreaterThan(nn, Literal(0L)),
                Divide(Cast(acc, DoubleType), Cast(nn, DoubleType),
                  EvalMode.LEGACY),
                Literal(null, DoubleType)), al.name)(exprId = al.exprId)
            }
        else None
      case al @ Alias(ae: AggregateExpression, _)
          if ae.isDistinct && ae.filter.isEmpty =>
        // count(DISTINCT x) serves verbatim from the view's stored
        // distinct-count column (maintained by affected-group
        // recompute, so the stored value IS the aggregate)
        val sqlN = GraftViewRouting.normExpr(ae)
        view.distinctCols
          .find { case (_, arg) =>
            GraftViewRouting.norm(s"count(distinct $arg)") == sqlN }
          .flatMap { case (n, _) => byName.get(n.toLowerCase) }
          .filter(_.dataType == al.dataType)
          .map(a => Alias(KnownNotNull(a), al.name)(exprId = al.exprId))
      case a @ Alias(attr: AttributeReference, _)
          if groupSet(attr.name.toLowerCase) =>
        mapGroup(a, attr.name)
      case attr: AttributeReference if groupSet(attr.name.toLowerCase) =>
        mapGroup(attr, attr.name)
      case _ => None
    }
    if (outs.exists(_.isEmpty)) None
    else remapFilters(filters, byName).map { fs =>
      Project(outs.flatten,
        fs.foldLeft(viewRel: LogicalPlan)((p, c) => Filter(c, p)))
    }
  }

  private def bareGroupNames(gs: Seq[Expression]): Option[Set[String]] =
    if (gs.nonEmpty && gs.forall(_.isInstanceOf[AttributeReference]))
      Some(gs.map(_.asInstanceOf[AttributeReference].name.toLowerCase).toSet)
    else None

  private def fresh(v: IncrementalView): Boolean =
    try v.watermark.isDefined && v.watermark == v.source.latestVersion
    catch { case _: Exception => false }

  /** A fresh relation over the view table (the path provider serves
    * the manifest-resolved parquet; pushdown happens downstream).
    */
  private def viewRelation(view: IncrementalView): Option[DataSourceV2Relation] =
    viewRelationAt(view.table.path)

  private def viewRelationAt(path: String): Option[DataSourceV2Relation] = {
    val provider = new graft.sources.GraftDataSource
    val opts = new CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", path))
    try {
      val table = provider.getTable(provider.inferSchema(opts),
        provider.inferPartitioning(opts), opts.asCaseSensitiveMap())
      Some(DataSourceV2Relation.create(table, None, None, opts))
    } catch { case _: Exception => None }
  }

  /** Remap group-column filters onto the view's columns by name (their
    * dtypes are the source's — the view stores the keys verbatim);
    * None when any reference fails to remap.
    */
  private def remapFilters(filters: Seq[Expression],
      byName: Map[String, org.apache.spark.sql.catalyst.expressions.Attribute])
      : Option[Seq[Expression]] = {
    val remapped: Seq[Option[Expression]] = filters.map { f =>
      var ok = true
      val r = f.transform {
        case a: AttributeReference =>
          byName.get(a.name.toLowerCase)
            .filter(_.dataType == a.dataType)
            .getOrElse { ok = false; a }
      }
      if (ok) Some(r) else None
    }
    if (remapped.exists(_.isEmpty)) None else Some(remapped.flatten)
  }

  private def rewrite(agg: Aggregate, view: IncrementalView,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    val viewRel = viewRelation(view).getOrElse(return None)
    val byName = viewRel.output.map(a => a.name.toLowerCase -> a).toMap
    val aggSqlToCol: Map[String, String] =
      view.aggs.map { case (c, s) => GraftViewRouting.norm(s) -> c.toLowerCase }.toMap
    val groupSet = view.groupCols.map(_.toLowerCase).toSet

    // every output must map to a view column of the SAME data type;
    // nullability narrows via KnownNotNull (parquet reads everything
    // nullable, the original aggregate output may not be)
    def mapped(orig: NamedExpression, viewColName: String): Option[NamedExpression] =
      byName.get(viewColName).filter(_.dataType == orig.dataType).map { va =>
        val child = if (!orig.nullable && va.nullable) KnownNotNull(va) else va
        Alias(child, orig.name)(exprId = orig.exprId)
      }

    val outs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a @ Alias(ae: AggregateExpression, _) =>
        aggSqlToCol.get(GraftViewRouting.normExpr(ae)).flatMap(mapped(a, _))
      case a @ Alias(attr: AttributeReference, _)
          if groupSet(attr.name.toLowerCase) =>
        mapped(a, attr.name.toLowerCase)
      case attr: AttributeReference if groupSet(attr.name.toLowerCase) =>
        mapped(attr, attr.name.toLowerCase)
      case _ => None
    }
    if (outs.exists(_.isEmpty)) return None
    remapFilters(filters, byName).map { fs =>
      val base = fs.foldLeft(viewRel: LogicalPlan)((p, c) => Filter(c, p))
      Project(outs.flatten, base)
    }
  }

  /** ROLLUP routing: the query groups by a STRICT SUBSET of the view's
    * keys, so the view's per-fine-group rows re-aggregate —
    * `count(*)`→`sum(cnt)`, `sum(x)`→`sum(sum_x)`, `max`→`max`,
    * `min`→`min`, and `avg(x)`→`sum(sum_x)/sum(cnt_x)` when the view
    * carries BOTH `sum(x)` and `count(x)` with LONG sums (anything
    * else — DISTINCT, FILTER clauses, cast-wrapped definitions,
    * fractional/decimal avg inputs — fails closed). dtypes must
    * survive the re-aggregation unchanged (a decimal sum widens and
    * is rejected).
    */
  private def rewriteRollup(agg: Aggregate, view: IncrementalView,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Max, Min, Sum}
    import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, EvalMode}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val viewRel = viewRelation(view).getOrElse(return None)
    val byName = viewRel.output.map(a => a.name.toLowerCase -> a).toMap
    val aggSqlToCol: Map[String, String] =
      view.aggs.map { case (c, s) => GraftViewRouting.norm(s) -> c.toLowerCase }.toMap
    val groupSet = agg.groupingExpressions
      .collect { case a: AttributeReference => a.name.toLowerCase }.toSet

    /** `avg(x)` decomposes over the view's exact per-fine-group
      * `sum(x)` + `count(x)` (count(*) is NOT count(x) — it counts
      * NULLs — so only a literal `count(x)` qualifies). Restricted to
      * LONG-typed view sums (integral x): there the routed
      * `cast(sum(sum_x) as double) / cast(sum(cnt_x) as double)` and
      * the unrouted Average (per-row double accumulation) are both
      * exact integer arithmetic while the sums stay within 2^53, hence
      * bit-equal; a fractional x accumulates differently per partition
      * order in BOTH plans, so routing it would trade one
      * non-determinism for another — fail closed instead. The LEGACY
      * divide mirrors Average.evaluateExpression (count 0 → NULL, not
      * an ANSI error).
      */
    def reAvg(orig: NamedExpression, sqlN: String): Option[NamedExpression] = {
      val arg = sqlN.stripPrefix("avg(").stripSuffix(")")
      for {
        sumA <- aggSqlToCol.get(s"sum($arg)").flatMap(byName.get)
        cntA <- aggSqlToCol.get(s"count($arg)").flatMap(byName.get)
        if sumA.dataType == LongType && cntA.dataType == LongType &&
          orig.dataType == DoubleType
      } yield {
        val total = AggregateExpression(Sum(sumA), Complete, isDistinct = false)
        val n = AggregateExpression(Sum(cntA), Complete, isDistinct = false)
        Alias(Divide(Cast(total, DoubleType), Cast(n, DoubleType),
          EvalMode.LEGACY), orig.name)(exprId = orig.exprId)
      }
    }

    def reAgg(orig: NamedExpression, ae: AggregateExpression): Option[NamedExpression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val sqlN = GraftViewRouting.normExpr(ae)
      val head = sqlN.takeWhile(_ != '(')
      if (head == "avg") return reAvg(orig, sqlN)
      val viewCol = aggSqlToCol.get(sqlN)
        .flatMap(byName.get)
        .getOrElse(return None)
      val fn = head match {
        case "count" | "sum" => Sum(viewCol)
        case "max" => Max(viewCol)
        case "min" => Min(viewCol)
        case _ => return None
      }
      val rolled = AggregateExpression(fn, Complete, isDistinct = false)
      if (rolled.dataType != orig.dataType) None
      else {
        val child = if (!orig.nullable) KnownNotNull(rolled) else rolled
        Some(Alias(child, orig.name)(exprId = orig.exprId))
      }
    }

    val outs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a @ Alias(ae: AggregateExpression, _) => reAgg(a, ae)
      case a @ Alias(attr: AttributeReference, _)
          if groupSet(attr.name.toLowerCase) =>
        byName.get(attr.name.toLowerCase)
          .filter(_.dataType == a.dataType)
          .map(va => Alias(va, a.name)(exprId = a.exprId))
      case attr: AttributeReference if groupSet(attr.name.toLowerCase) =>
        byName.get(attr.name.toLowerCase)
          .filter(_.dataType == attr.dataType)
          .map(va => Alias(va, attr.name)(exprId = attr.exprId))
      case _ => None
    }
    if (outs.exists(_.isEmpty)) return None
    remapFilters(filters, byName).map { fs =>
      val base = fs.foldLeft(viewRel: LogicalPlan)((p, c) => Filter(c, p))
      val groups: Seq[Expression] = agg.groupingExpressions.collect {
        case a: AttributeReference => byName(a.name.toLowerCase)
      }
      Aggregate(groups, outs.flatten, base)
    }
  }
}
