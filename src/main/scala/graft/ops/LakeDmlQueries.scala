package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.lake.IncrementalTable

/** The table format's ROW-LEVEL DML as oracled queries: each one
  * builds an [[IncrementalTable]] from a testdata table (content-keyed
  * temp dir, built once per dataset — the `lake_zorder_scan` pattern),
  * runs the mutation under test, and reads the result back so plain
  * DuckDB SQL over the raw parquet can replay the END STATE exactly:
  *
  *  - `lake_delete_scan`    copy-on-write DELETE (touched-file rewrite)
  *  - `lake_dv_scan`        merge-on-read DELETE (stacked deletion
  *                          vectors applied at scan)
  *  - `lake_update_scan`    copy-on-write UPDATE (simultaneous SET)
  *  - `lake_cdf_feed`       the change feed across appends + a delete
  *  - `lake_restore_scan`   RESTORE to a pre-delete version
  *  - `lake_widen_scan`     the full type-widening arc (gated enable,
  *                          widening append, write-side conform of a
  *                          post-widening narrow batch, compaction,
  *                          footer-validated DROP FEATURE)
  *  - `lake_incr_view`      CDF-maintained materialized aggregate
  *                          (affected-key recompute; big-delta and
  *                          sparse-delta refreshes)
  *  - `lake_rowid_scan`     the row-tracking arc (enable + backfill,
  *                          allocated append, id-preserving UPDATE and
  *                          compaction)
  *
  * The mutations never invent data — every surviving/updated/fed row
  * is a deterministic function of the source table — which is what
  * makes the whole DML path (stats-pruned candidates, per-file
  * rewrite, vector anti-join, CDC sidecars, restore commit)
  * hash-checkable against an engine that shares none of the machinery.
  */
object LakeDmlQueries {

  /** Build-once cache with a completion marker: `finalOp` must be the
    * operation string of the LAST commit in `build`, so a half-built
    * table from a crashed earlier run is rebuilt, never trusted.
    */
  private def cached(spark: SparkSession, dir: String, srcTable: String,
      tag: String, finalOp: String)(build: IncrementalTable => Unit): IncrementalTable = {
    val src = new java.io.File(s"$dir/$srcTable.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, src.length, src.lastModified, tag).hashCode)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lake_${tag}_$key"
    val t = new IncrementalTable(spark, path)
    val complete = t.exists &&
      t.latestVersion.exists(v => t.operationAt(v) == finalOp)
    if (!complete) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      val fresh = new IncrementalTable(spark, path)
      build(fresh)
      return fresh
    }
    t
  }

  /** Copy-on-write DELETE: fulfilled 'F' orders under 100k are removed;
    * only files whose stats admit a match are rewritten.
    */
  def lakeDeleteScan(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(spark, dir, "orders", "del", "delete") { t =>
      t.append(Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice"))
      t.deleteWhere(col("o_orderstatus") === "F" && col("o_totalprice") < 100000.0)
    }
    t.snapshot().orderBy("o_orderkey")
  }

  /** Merge-on-read DELETE: two STACKED deletion-vector commits, no data
    * file rewritten; the scan's vector anti-join produces the state.
    */
  def lakeDvScan(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(spark, dir, "customer", "dv", "delete[dv]") { t =>
      t.append(Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      t.deleteVector(col("c_acctbal") < 0.0)
      t.deleteVector(col("c_nationkey") === 5)
    }
    t.snapshot().orderBy("c_custkey")
  }

  /** Copy-on-write UPDATE with simultaneous assignments evaluated
    * against the original row.
    */
  def lakeUpdateScan(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(spark, dir, "customer", "upd", "update") { t =>
      t.append(Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal"))
      t.updateWhere(col("c_nationkey") < 5,
        Map("c_acctbal" -> (col("c_acctbal") + 1000.0)))
    }
    t.snapshot().orderBy("c_custkey")
  }

  /** The change feed across two appends and a copy-on-write delete:
    * inserts come from the manifest file deltas, the delete from its
    * CDC sidecar, each tagged with its commit version.
    */
  /** The two-appends-plus-delete table behind BOTH CDF queries. */
  private def cdfTable(spark: SparkSession, dir: String): IncrementalTable = {
    val supplier = Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey")
    val split = supplier.agg(floor(max(col("s_suppkey")) / 2.0).cast("long"))
      .head().getLong(0)
    cached(spark, dir, "supplier", "cdf", "delete") { t =>
      t.append(supplier.filter(col("s_suppkey") <= split))
      t.append(supplier.filter(col("s_suppkey") > split))
      t.deleteWhere(col("s_nationkey") === 3)
    }
  }

  def lakeCdfFeed(spark: SparkSession, dir: String): DataFrame =
    cdfTable(spark, dir).changes(-1L, 2L)
      .select("s_suppkey", "s_name", "_change_type", "_commit_version")
      .orderBy("_commit_version", "s_suppkey", "_change_type")

  /** The SAME change feed, delivered through STRUCTURED STREAMING: a
    * `readChangeFeed=true` micro-batch stream drained with
    * `Trigger.AvailableNow` into an in-memory sink — one oracled query
    * covering the full DSv2 stream path (version offsets, per-commit
    * batches, CDC sidecar reads) against the identical DuckDB replay
    * as the batch feed.
    */
  def lakeCdfStream(spark: SparkSession, dir: String): DataFrame = {
    val t = cdfTable(spark, dir)
    val sink = "graft_cdf_stream_" +
      java.util.UUID.randomUUID().toString.take(8)
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(t.path)
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), "cdf stream did not drain")
    finally q.stop()
    spark.table(sink)
      .select("s_suppkey", "s_name", "_change_type", "_commit_version")
      .orderBy("_commit_version", "s_suppkey", "_change_type")
  }

  /** RESTORE: delete a slice, then rewind to the pre-delete version —
    * the scan must read back the UNTOUCHED source table.
    */
  def lakeRestoreScan(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(spark, dir, "nation", "rst", "restore[0]") { t =>
      t.append(Tables.load(spark, dir, "nation"))
      t.deleteWhere(col("n_regionkey") === 2)
      t.restore(0L)
    }
    t.snapshot().orderBy("n_nationkey")
  }

  /** The round-7 type-widening arc as ONE oracled query: gated enable;
    * a narrow (int, float) slice; a WIDENING (long, double) slice; a
    * post-widening narrow slice that conformWidths upcasts at write;
    * compaction; and the footer-validated `DROP FEATURE` — the final
    * reader-feature-free state replays in plain SQL because every
    * value is a deterministic function of the source (the narrow
    * slices round p_retailprice through REAL, which IEEE
    * round-to-nearest makes exact to replay on both engines).
    */
  def lakeWidenScan(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .select("p_partkey", "p_size", "p_retailprice")
    def slice(r: Int) = part.filter(col("p_partkey") % 3 === r)
    def narrow(df: DataFrame) = df.select(col("p_partkey"),
      col("p_size").cast("int").as("p_size"),
      col("p_retailprice").cast("float").as("p_retailprice"))
    val t = cached(spark, dir, "part", "wid", "drop feature[type-widening]") { t =>
      t.setTypeWidening(true)
      t.append(narrow(slice(0)))
      t.append(slice(1).select(col("p_partkey"),
        col("p_size").cast("long").as("p_size"), col("p_retailprice")))
      t.append(narrow(slice(2))) // conformed to (long, double) at write
      t.compact(targetFiles = 2)
      t.dropTypeWideningDemand()
    }
    t.snapshot().orderBy("p_partkey")
  }

  /** The round-8 ROW-TRACKING arc as ONE oracled query: append half
    * the table untracked; enable row tracking (one backfill rewrite —
    * ids 1..n in file order); append the other half (watermark
    * allocation — ids n+1..N); copy-on-write UPDATE (ids preserved
    * through the rewrite); compact (ids preserved through the full
    * restage). Both appends are single-file and custkey-sorted, so the
    * final `_row_id` is exactly `row_number() OVER (ORDER BY
    * c_custkey)` — which is what lets plain SQL replay a STABLE
    * IDENTITY assignment hash-for-hash: any id lost, reassigned or
    * duplicated by UPDATE or compaction changes the hash.
    */
  def lakeRowIdScan(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val split = cust.agg(floor(max(col("c_custkey")) / 2.0).cast("long"))
      .head().getLong(0)
    def half(p: org.apache.spark.sql.Column) =
      cust.filter(p).orderBy("c_custkey").coalesce(1)
    val t = cached(spark, dir, "customer", "rid", "compact") { t =>
      t.append(half(col("c_custkey") <= split))
      t.enableRowTracking()
      t.append(half(col("c_custkey") > split))
      t.updateWhere(col("c_nationkey") < 5,
        Map("c_acctbal" -> (col("c_acctbal") + 1000.0)))
      t.compact(targetFiles = 2)
    }
    t.snapshot()
      .select("_row_id", "c_custkey", "c_nationkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** The round-8 INCREMENTAL MATERIALIZED VIEW arc as ONE oracled
    * query ([[graft.lake.IncrementalView]]): materialize a per-
    * customer aggregate over half of `orders`; append the other half
    * and refresh (big delta → null-safe semi-join recompute); then a
    * sparse UPDATE (+1000 on ~1/997 of orderkeys) and a sparse DELETE
    * (~1/991), and refresh again — this one derives the touched
    * custkeys from the change feed and recomputes ONLY those groups
    * through stats-pruned scans on both the source and the view
    * (IncrementalViewSpec pins the pruning; here the ORACLE pins that
    * two maintenance strategies and a full SQL replay agree on every
    * value). `max` is in the aggregate on purpose: it is not delta-
    * maintainable, only recomputable — the design's core claim.
    * Decimal-routed sum keeps the double hash order-independent (the
    * q1_agg pattern).
    */
  def lakeIncrViewScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.IncrementalView
    val srcFile = new java.io.File(s"$dir/orders.parquet")
    // tag carries the _viewdef format era: a /tmp cache built by an
    // older library must rebuild, not mis-parse
    val key = java.lang.Integer.toHexString(
      (dir, srcFile.length, srcFile.lastModified, "mview2").hashCode)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_lake_mview_$key"
    val srcT = new IncrementalTable(spark, s"$base/src")
    val viewDir = s"$base/view"
    val viewT = new IncrementalTable(spark, viewDir)
    // complete = the source finished its DML arc AND the view's
    // watermark reflects the source HEAD (distinguishes refresh #2
    // from refresh #1 — both commit as "refresh")
    val complete = srcT.exists && viewT.exists &&
      srcT.latestVersion.exists(v => srcT.operationAt(v) == "delete") &&
      viewT.latestVersion.exists(v =>
        viewT.metaAt(v).get(IncrementalView.WmKey) ==
          srcT.latestVersion.map(_.toString))
    if (!complete) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val s = new IncrementalTable(spark, s"$base/src")
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val split = orders.agg(floor(max(col("o_orderkey")) / 2.0).cast("long"))
        .head().getLong(0)
      // custkey-clustered files so the sparse refresh can prune
      s.append(orders.filter(col("o_orderkey") <= split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      val view = IncrementalView.create(spark, s, viewDir,
        Seq("o_custkey"), Seq(
          "cnt" -> "count(*)",
          "sum_price" ->
            "cast(sum(cast(o_totalprice as decimal(18,2))) as double)",
          "max_price" -> "max(o_totalprice)"))
      s.append(orders.filter(col("o_orderkey") > split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      view.refresh() // big delta: semi-join recompute
      s.updateWhere(col("o_orderkey") % 997L === 0L,
        Map("o_totalprice" -> (col("o_totalprice") + 1000.0)))
      s.deleteWhere(col("o_orderkey") % 991L === 0L)
      view.refresh() // sparse delta: pruned affected-key recompute
    }
    IncrementalView.open(spark, srcT, viewDir)
      .snapshot().orderBy("o_custkey")
  }

  /** The round-8 DELTA-MAINTAINED JOIN VIEW arc as ONE oracled query
    * ([[graft.lake.IncrementalJoinView]]): a star-schema aggregate
    * `orders ⋈ customer GROUP BY c_nationkey` — group keys live on the
    * DIM side, so affected-key recompute would re-scan O(fact) and the
    * view is maintained by SIGNED DELTA aggregation instead. Arc:
    * materialize over half of orders; append the other half and
    * refresh (insert-weighted delta — the fact table is never
    * re-scanned); sparse UPDATE (+1000 on ~1/997) and sparse DELETE
    * (~1/991), refresh again (pre/post images weight −/+, deletes
    * weight −). The ORACLE replays the final state as one plain-SQL
    * join aggregate: any drift a delta merge introduced — a lost
    * group, a mis-signed image, a decimal accumulator off by a cent —
    * changes the hash. Decimal-routed sum keeps the double exact (the
    * q1_agg pattern); `snapshot()` restores sum's NULL contract from
    * the stored non-null counter.
    */
  def lakeJoinViewScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.{DimSpec, IncrementalJoinView, IncrementalView}
    val srcFile = new java.io.File(s"$dir/orders.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, srcFile.length, srcFile.lastModified, "jview1").hashCode)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_lake_jview_$key"
    val factT = new IncrementalTable(spark, s"$base/fact")
    val viewDir = s"$base/view"
    val viewT = new IncrementalTable(spark, viewDir)
    val complete = factT.exists && viewT.exists &&
      factT.latestVersion.exists(v => factT.operationAt(v) == "delete") &&
      viewT.latestVersion.exists(v =>
        viewT.metaAt(v).get(IncrementalView.WmKey) ==
          factT.latestVersion.map(_.toString))
    if (!complete) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val dim = new IncrementalTable(spark, s"$base/dim")
      dim.append(Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey"))
      val fact = new IncrementalTable(spark, s"$base/fact")
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val split = orders.agg(floor(max(col("o_orderkey")) / 2.0).cast("long"))
        .head().getLong(0)
      fact.append(orders.filter(col("o_orderkey") <= split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      val view = IncrementalJoinView.create(spark, fact,
        Seq(DimSpec(s"$base/dim", "o_custkey", "c_custkey")), viewDir,
        Seq("c_nationkey"), Seq(
          "cnt" -> "count(*)",
          "sum_price" -> "sum(cast(o_totalprice as decimal(18,2)))"))
      fact.append(orders.filter(col("o_orderkey") > split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      view.refresh() // insert-only delta
      fact.updateWhere(col("o_orderkey") % 997L === 0L,
        Map("o_totalprice" -> (col("o_totalprice") + 1000.0)))
      fact.deleteWhere(col("o_orderkey") % 991L === 0L)
      view.refresh() // mixed images: pre/post/delete weights
    }
    IncrementalJoinView.open(spark, viewDir).snapshot()
      .select(col("c_nationkey"), col("cnt"),
        col("sum_price").cast("double").as("sum_price"))
      .orderBy("c_nationkey")
  }

  /** The round-9 HYBRID-EXTREME join-view arc
    * ([[graft.lake.IncrementalJoinView]] max/min maintenance): the
    * star aggregate carries `max(o_totalprice)` and `min(o_orderkey)`
    * alongside the signed-delta count/sum. Arc: materialize over half
    * of orders; append the rest (insert-only delta — extremes fold by
    * `greatest`/`least`, fact never scanned); boost ~1/997 prices by
    * +100000 (update images — only groups whose pre-image ties their
    * stored max recompute); then delete every order above 98% of the
    * boosted maximum — an EXTREME-DELETING delete that invalidates
    * most groups' stored max, forcing the hybrid's affected-group
    * recompute (join-key-pruned fact scan). The oracle replays the
    * final state as one plain-SQL join aggregate: a stale extreme, a
    * recompute that missed a group, or a wrongly-pruned file all
    * change the hash.
    */
  def lakeJoinViewMinMax(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.{DimSpec, IncrementalJoinView, IncrementalView}
    val srcFile = new java.io.File(s"$dir/orders.parquet")
    // "jvmm2": the view def gained an avg aggregate (stored sum + nn,
    // divided at read) — a stale cache would miss the column
    val key = java.lang.Integer.toHexString(
      (dir, srcFile.length, srcFile.lastModified, "jvmm2").hashCode)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_lake_jvmm_$key"
    val factT = new IncrementalTable(spark, s"$base/fact")
    val viewDir = s"$base/view"
    val viewT = new IncrementalTable(spark, viewDir)
    val complete = factT.exists && viewT.exists &&
      factT.latestVersion.exists(v => factT.operationAt(v) == "delete") &&
      viewT.latestVersion.exists(v =>
        viewT.metaAt(v).get(IncrementalView.WmKey) ==
          factT.latestVersion.map(_.toString))
    if (!complete) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val dim = new IncrementalTable(spark, s"$base/dim")
      dim.append(Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey"))
      val fact = new IncrementalTable(spark, s"$base/fact")
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val split = orders.agg(floor(max(col("o_orderkey")) / 2.0).cast("long"))
        .head().getLong(0)
      fact.append(orders.filter(col("o_orderkey") <= split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      val view = IncrementalJoinView.create(spark, fact,
        Seq(DimSpec(s"$base/dim", "o_custkey", "c_custkey")), viewDir,
        Seq("c_nationkey"), Seq(
          "cnt" -> "count(*)",
          "sum_price" -> "sum(cast(o_totalprice as decimal(18,2)))",
          "avg_price" -> "avg(cast(o_totalprice as decimal(18,2)))",
          "max_price" -> "max(o_totalprice)",
          "min_order" -> "min(o_orderkey)"))
      fact.append(orders.filter(col("o_orderkey") > split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      view.refresh() // insert-only: pure greatest/least, no fact scan
      fact.updateWhere(col("o_orderkey") % 997L === 0L,
        Map("o_totalprice" -> (col("o_totalprice") + 100000.0)))
      view.refresh() // update images; recompute only where a pre-image
      // ties-or-beats its group's stored max
      val thr = fact.snapshot()
        .agg((max(col("o_totalprice")) * lit(0.98)).as("t")).head().getDouble(0)
      fact.deleteWhere(col("o_totalprice") > thr)
      view.refresh() // extreme-deleting: affected groups recompute
      require(view.lastRefresh.exists(m => m.mode == "delta" &&
        m.sourceFilesScanned > 0),
        s"minmax arc must exercise the recompute path: ${view.lastRefresh}")
    }
    IncrementalJoinView.open(spark, viewDir).snapshot()
      .select(col("c_nationkey"), col("cnt"),
        col("sum_price").cast("double").as("sum_price"),
        col("avg_price"),
        col("max_price"), col("min_order"))
      .orderBy("c_nationkey")
  }

  /** DISTINCT-COUNT join view as an oracled DML arc: `count(distinct
    * o_custkey)` per nation — distinct users per dim attribute, the
    * dashboard aggregate delta maintenance cannot serve (multiplicity
    * lives only in the fact), maintained by AFFECTED-GROUP recompute
    * ([[graft.lake.IncrementalJoinView]] `distincts`). Arc: half the
    * orders → create (count/distinct/sum) → append the rest + refresh
    * (every touched group recomputes; the decomposable cnt/sum merge
    * by signed delta in the same pass) → sparse delete (~1/991) +
    * refresh (deleting one of a customer's orders must NOT drop the
    * customer while deleting their last one must). The oracle replays
    * the end state as one plain-SQL distinct aggregate.
    */
  def lakeJoinViewDistinct(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.{DimSpec, IncrementalJoinView, IncrementalView}
    val srcFile = new java.io.File(s"$dir/orders.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, srcFile.length, srcFile.lastModified, "jvdc1").hashCode)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_lake_jvdc_$key"
    val factT = new IncrementalTable(spark, s"$base/fact")
    val viewDir = s"$base/view"
    val viewT = new IncrementalTable(spark, viewDir)
    val complete = factT.exists && viewT.exists &&
      factT.latestVersion.exists(v => factT.operationAt(v) == "delete") &&
      viewT.latestVersion.exists(v =>
        viewT.metaAt(v).get(IncrementalView.WmKey) ==
          factT.latestVersion.map(_.toString))
    if (!complete) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val dim = new IncrementalTable(spark, s"$base/dim")
      dim.append(Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey"))
      val fact = new IncrementalTable(spark, s"$base/fact")
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val split = orders.agg(floor(max(col("o_orderkey")) / 2.0).cast("long"))
        .head().getLong(0)
      fact.append(orders.filter(col("o_orderkey") <= split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      val view = IncrementalJoinView.create(spark, fact,
        Seq(DimSpec(s"$base/dim", "o_custkey", "c_custkey")), viewDir,
        Seq("c_nationkey"), Seq(
          "cnt" -> "count(*)",
          "du" -> "count(distinct o_custkey)",
          "sum_price" -> "sum(cast(o_totalprice as decimal(18,2)))"))
      fact.append(orders.filter(col("o_orderkey") > split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      view.refresh() // inserts touch every group: all recompute
      fact.deleteWhere(col("o_orderkey") % 991L === 0L)
      view.refresh() // sparse deletes: touched groups recompute
      require(view.lastRefresh.exists(_.mode == "delta"),
        s"distinct arc must stay on the delta path: ${view.lastRefresh}")
    }
    IncrementalJoinView.open(spark, viewDir).snapshot()
      .select(col("c_nationkey"), col("cnt"), col("du"),
        col("sum_price").cast("double").as("sum_price"))
      .orderBy("c_nationkey")
  }

  /** SNOWFLAKE-chain join view (dim of dim) as an oracled arc:
    * `orders ⋈ customer ⋈ nation GROUP BY n_name` — the second
    * [[graft.lake.DimSpec]]'s join key (`c_nationkey`) is a CUSTOMER
    * column, not a fact column, so both maintenance halves must walk
    * the chain: signed deltas join the full dim sequence, and the
    * extreme-recompute drops the un-resolvable nation-side prune
    * conjunct (prune less, never mis-plan). Arc: half append →
    * insert-only rest → price boosts (update images) → an
    * extreme-deleting delete that forces the affected-group recompute
    * through the chain. Oracle = the final three-table SQL aggregate.
    */
  def lakeJoinViewSnowflake(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.{DimSpec, IncrementalJoinView, IncrementalView}
    val srcFile = new java.io.File(s"$dir/orders.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, srcFile.length, srcFile.lastModified, "jvsf1").hashCode)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_lake_jvsf_$key"
    val factT = new IncrementalTable(spark, s"$base/fact")
    val viewDir = s"$base/view"
    val viewT = new IncrementalTable(spark, viewDir)
    val complete = factT.exists && viewT.exists &&
      factT.latestVersion.exists(v => factT.operationAt(v) == "delete") &&
      viewT.latestVersion.exists(v =>
        viewT.metaAt(v).get(IncrementalView.WmKey) ==
          factT.latestVersion.map(_.toString))
    if (!complete) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val cust = new IncrementalTable(spark, s"$base/cust")
      cust.append(Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey"))
      val nat = new IncrementalTable(spark, s"$base/nat")
      nat.append(Tables.load(spark, dir, "nation")
        .select("n_nationkey", "n_name"))
      val fact = new IncrementalTable(spark, s"$base/fact")
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val split = orders.agg(floor(max(col("o_orderkey")) / 2.0).cast("long"))
        .head().getLong(0)
      fact.append(orders.filter(col("o_orderkey") <= split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      val view = IncrementalJoinView.create(spark, fact,
        Seq(DimSpec(s"$base/cust", "o_custkey", "c_custkey"),
          DimSpec(s"$base/nat", "c_nationkey", "n_nationkey")), viewDir,
        Seq("n_name"), Seq(
          "cnt" -> "count(*)",
          "sum_price" -> "sum(cast(o_totalprice as decimal(18,2)))",
          "max_price" -> "max(o_totalprice)"))
      fact.append(orders.filter(col("o_orderkey") > split)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      view.refresh() // insert-only greatest-merge through the chain
      fact.updateWhere(col("o_orderkey") % 997L === 0L,
        Map("o_totalprice" -> (col("o_totalprice") + 100000.0)))
      view.refresh()
      val thr = fact.snapshot()
        .agg((max(col("o_totalprice")) * lit(0.98)).as("t")).head().getDouble(0)
      fact.deleteWhere(col("o_totalprice") > thr)
      view.refresh() // extreme-deleting recompute through the chain
      require(view.lastRefresh.exists(m => m.mode == "delta" &&
        m.sourceFilesScanned > 0),
        s"snowflake arc must exercise the recompute path: ${view.lastRefresh}")
    }
    IncrementalJoinView.open(spark, viewDir).snapshot()
      .select(col("n_name"), col("cnt"),
        col("sum_price").cast("double").as("sum_price"), col("max_price"))
      .orderBy("n_name")
  }

  /** The SERVING half of the join-view system as an oracled query:
    * register the fresh view with [[graft.plans.GraftViewRouting]] and
    * run the dashboard shape — `WHERE <dim-attr> GROUP BY <dim-attr>`
    * over the star join. The optimizer rewrites it to a FILTERED scan
    * of the view (the query REQUIRES the routed plan — an unrouted
    * pass would be silently weaker evidence), and the oracle checks
    * the routed answer against the plain-SQL join aggregate: the
    * stored-accumulator projection, the NULL contract, the group-
    * column filter re-targeting and the extreme columns all hash.
    */
  /** The shared fact/dim/join-view warehouse behind
    * [[lakeJoinViewFiltered]] and [[lakeViewRouteDiscovery]] (built
    * once, idempotent re-entry). Returns the warehouse base dir.
    */
  private def jvFilteredBase(spark: SparkSession, dir: String): String = {
    import graft.lake.{DimSpec, IncrementalJoinView, IncrementalView}
    val srcFile = new java.io.File(s"$dir/orders.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, srcFile.length, srcFile.lastModified, "jvflt1").hashCode)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_lake_jvflt_$key"
    val factT = new IncrementalTable(spark, s"$base/fact")
    val viewDir = s"$base/view_mv"
    val viewT = new IncrementalTable(spark, viewDir)
    val complete = factT.exists && viewT.exists &&
      viewT.latestVersion.exists(v =>
        viewT.metaAt(v).get(IncrementalView.WmKey) ==
          factT.latestVersion.map(_.toString))
    if (!complete) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val dim = new IncrementalTable(spark, s"$base/dim")
      dim.append(Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey"))
      val fact = new IncrementalTable(spark, s"$base/fact")
      fact.append(Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"))
      IncrementalJoinView.create(spark, fact,
        Seq(DimSpec(s"$base/dim", "o_custkey", "c_custkey")), viewDir,
        Seq("c_nationkey"), Seq(
          "cnt" -> "count(*)",
          "sum_price" -> "sum(cast(o_totalprice as decimal(18,2)))",
          "max_price" -> "max(o_totalprice)"))
    }
    base
  }

  def lakeJoinViewFiltered(spark: SparkSession, dir: String): DataFrame = {
    val base = jvFilteredBase(spark, dir)
    val viewDir = s"$base/view_mv"
    graft.plans.GraftViewRouting.registerJoin(spark, viewDir)
    val q = spark.read.format("graft").load(s"$base/fact")
      .join(spark.read.format("graft").load(s"$base/dim"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") < 13)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("cnt"),
        sum(expr("cast(o_totalprice as decimal(18,2))")).as("sum_price"),
        max("o_totalprice").as("max_price"))
    require(q.queryExecution.optimizedPlan.toString.contains("view_mv"),
      "join-view routing did not engage — the query would silently " +
        "measure the unrouted plan:\n" +
        q.queryExecution.optimizedPlan.toString.take(2000))
    q.select(col("c_nationkey"), col("cnt"),
      col("sum_price").cast("double").as("sum_price"), col("max_price"))
      .orderBy("c_nationkey")
  }

  /** The serving win made DURABLE — the routed dashboard aggregate
    * after a SESSION RESTART with ZERO manual registration. Reuses
    * [[lakeJoinViewFiltered]]'s warehouse, then simulates the restart:
    * the JVM-local routing registries are cleared and a NEW
    * SparkSession (fresh session state, fresh discovery memo) runs
    * the star aggregate with only
    * `spark.graft.viewRouting.discoverPaths` pointing at the
    * warehouse. The optimizer's first pass finds the `_viewdef`
    * sidecar, re-attaches the join-view registration and routes; the
    * query REQUIRES the routed plan — without discovery it would
    * silently serve the unrouted O(fact) scan — and the oracle hashes
    * the served values against the plain-SQL star aggregate.
    */
  def lakeViewRouteDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val base = jvFilteredBase(spark, dir)
    graft.plans.GraftViewRouting.clear() // simulate the process restart
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.viewRouting.discoverPaths", base)
    val q = s2.read.format("graft").load(s"$base/fact")
      .join(s2.read.format("graft").load(s"$base/dim"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") >= 13)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("cnt"),
        sum(expr("cast(o_totalprice as decimal(18,2))")).as("sum_price"),
        max("o_totalprice").as("max_price"))
    require(q.queryExecution.optimizedPlan.toString.contains("view_mv"),
      "view-routing discovery did not re-attach after the session " +
        "restart — the query would silently measure the unrouted plan:\n" +
        q.queryExecution.optimizedPlan.toString.take(2000))
    q.select(col("c_nationkey"), col("cnt"),
      col("sum_price").cast("double").as("sum_price"), col("max_price"))
      .orderBy("c_nationkey")
  }

  /** Atomic predicate-scoped overwrite (Delta's `replaceWhere`),
    * exercised through the DSv2 WRITER OPTION end-to-end: load orders,
    * then replace the fulfilled slice (`o_orderstatus = 'F'`) with the
    * same rows at +1000 price in ONE commit —
    * `df.write.format("graft").mode("overwrite")
    *    .option("replaceWhere", ...)`. The end state replays in plain
    * SQL because the replacement batch is a deterministic function of
    * the source slice; a half-replaced state (separate delete+append)
    * or a row leaking outside the predicate would break the hash.
    */
  def lakeReplaceScan(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(spark, dir, "orders", "rpl", "replaceWhere") { t =>
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.append(orders)
      orders.filter(col("o_orderstatus") === "F")
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "o_orderstatus = 'F'")
        .save(t.path)
    }
    t.snapshot().orderBy("o_orderkey")
  }

  /** CONVERT TO GRAFT as an oracled arc
    * ([[graft.lake.IncrementalTable.convertInPlace]]): supplier is
    * written as a PLAIN parquet directory (4 range files — data that
    * never went through the table's write path), adopted in place by
    * the SQL statement (O(#files) renames + footer-stats harvest, no
    * byte rewritten), then proven first-class by running copy-on-write
    * DML on the adopted files (delete the negative-balance rows) and
    * aggregating the survivors. The oracle replays the whole arc from
    * the raw supplier table: a file the convert dropped, double-loaded
    * or mis-keyed through the delete changes the hash.
    */
  def lakeConvertScan(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(spark, dir, "supplier", "cvt", "delete") { t =>
      Tables.load(spark, dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .repartitionByRange(4, col("s_suppkey"))
        .sortWithinPartitions("s_suppkey")
        .write.mode("overwrite").parquet(t.path)
      spark.sql(s"CONVERT TO GRAFT '${t.path}'").collect()
      t.deleteWhere(col("s_acctbal") < 0.0)
    }
    t.snapshot()
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("cnt"),
        sum(expr("cast(s_acctbal as decimal(18,2))")).cast("double")
          .as("sum_bal"),
        min("s_suppkey").as("min_supp"))
      .orderBy("s_nationkey")
  }

  /** The SQL change-data-feed surface
    * ([[graft.plans.ResolveTableChanges]] — Delta's `table_changes`
    * TVF) over a four-commit DML arc: append half of orders (v0),
    * append the rest (v1), boost ~1/997 prices (v2 — CDC pre/post
    * images), delete ~1/501 (v3 — CDC deletes carrying post-update
    * values). `table_changes('<path>', 0)` must deliver the appends as
    * inserts from manifest deltas, the images from the sidecars, and
    * stamp each row's `_commit_version`; the oracle replays the whole
    * per-type disposition — counts, DECIMAL value sums and the exact
    * version window each type landed in — from the raw orders table.
    */
  def lakeTableChanges(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(spark, dir, "orders", "tchg", "delete") { t =>
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val split = orders.agg(floor(max(col("o_orderkey")) / 2.0).cast("long"))
        .head().getLong(0)
      t.append(orders.filter(col("o_orderkey") <= split))     // v0
      t.append(orders.filter(col("o_orderkey") > split))      // v1
      t.updateWhere(col("o_orderkey") % 997L === 0L,          // v2
        Map("o_totalprice" -> (col("o_totalprice") + 100000.0)))
      t.deleteWhere(col("o_orderkey") % 501L === 0L)          // v3
    }
    spark.sql(
      s"""SELECT _change_type, count(*) AS cnt,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS sum_price,
         |       MIN(_commit_version) AS min_v, MAX(_commit_version) AS max_v
         |FROM table_changes('${t.path}', 0)
         |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
  }

  /** COPY INTO as an oracled arc
    * ([[graft.lake.IncrementalTable.copyInto]]): customer lands in a
    * staging directory as plain parquet (3 range files); the first
    * COPY loads them, a literal RE-RUN of the same statement must
    * no-op (file-level idempotency), a later batch adds 2 more files
    * to the SAME directory and the third COPY loads ONLY those. A
    * double-load anywhere doubles group counts and breaks the hash —
    * the oracle is the plain customer aggregate.
    */
  def lakeCopyInto(spark: SparkSession, dir: String): DataFrame = {
    // NOT the plain `cached` helper: the arc commits TWO copy-into
    // versions (v0 first load, v1 late files — the no-op re-run
    // commits nothing), and a crash after v0 would satisfy a
    // last-op-only completeness check with half the customers
    val src = new java.io.File(s"$dir/customer.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, src.length, src.lastModified, "cpy").hashCode)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lake_cpy_$key"
    val t0 = new IncrementalTable(spark, path)
    val complete = t0.exists && t0.latestVersion.contains(1L) &&
      t0.operationAt(1L) == "copy-into"
    val t = if (complete) t0 else {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      val t = new IncrementalTable(spark, path)
      val customer = Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
      val split = customer.agg(floor(max(col("c_custkey")) / 2.0).cast("long"))
        .head().getLong(0)
      val in = s"${t.path}_in"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(in))
      customer.filter(col("c_custkey") <= split)
        .repartitionByRange(3, col("c_custkey"))
        .sortWithinPartitions("c_custkey")
        .write.mode("overwrite").parquet(in)
      require(spark.sql(s"COPY INTO '${t.path}' FROM '$in'")
        .head.getInt(1) == 3, "first COPY must load 3 files")
      require(spark.sql(s"COPY INTO '${t.path}' FROM '$in'")
        .head.getInt(1) == 0, "re-run must be a file-level no-op")
      customer.filter(col("c_custkey") > split)
        .repartitionByRange(2, col("c_custkey"))
        .sortWithinPartitions("c_custkey")
        .write.mode("append").parquet(in)
      require(spark.sql(s"COPY INTO '${t.path}' FROM '$in'")
        .head.getInt(1) == 2, "incremental COPY must load ONLY new files")
      t
    }
    t.snapshot()
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("cnt"),
        sum(expr("cast(c_acctbal as decimal(18,2))")).cast("double")
          .as("sum_bal"),
        max("c_custkey").as("max_cust"))
      .orderBy("c_nationkey")
  }

  /** DLT-style EXPECTATIONS on the write path
    * ([[graft.lake.Expectations]]) as ONE oracled arc: append the
    * documents through a drop-action token-count gate (plus a warn
    * rule and an always-passing fail rule), quarantining the short
    * docs with their failed-rule tags — then read back BOTH tables as
    * one disposition report. Every row's destination is a
    * deterministic function of its text, so plain SQL replays the
    * split; the rule metrics ride the append commit's manifest meta
    * (spec-pinned — the oracle pins the row routing).
    */
  def lakeExpectScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Expectations
    import graft.lake.Expectations.{Drop, Fail, Rule, Warn}
    val src = new java.io.File(s"$dir/documents.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, src.length, src.lastModified, "expect1").hashCode)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_lake_expect_$key"
    val target = new IncrementalTable(spark, s"$base/t")
    val quar = new IncrementalTable(spark, s"$base/q")
    val complete = target.exists && target.latestVersion.exists(v =>
      target.operationAt(v) == "append[expectations]")
    if (!complete) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"),
          graft.text.TextFunctions.tokenCount(col("text"))
            .cast("long").as("token_cnt"))
      Expectations.appendWithExpectations(
        new IncrementalTable(spark, s"$base/t"), docs,
        Seq(
          Rule("r_short", "token_cnt >= 30", Drop),
          Rule("r_long_text", "length(text) <= 400", Warn),
          Rule("r_has_id", "doc_id IS NOT NULL", Fail)),
        quarantine = Some(new IncrementalTable(spark, s"$base/q")),
        batchTag = "b0")
    }
    val kept = new IncrementalTable(spark, s"$base/t").snapshot()
      .select(col("doc_id"), lit("kept").as("disposition"),
        lit("").as("failed_rules"))
    val qT = new IncrementalTable(spark, s"$base/q")
    if (!qT.exists) kept.orderBy("doc_id") // no doc violated the gate
    else kept.unionByName(qT.snapshot()
      .select(col("doc_id"), lit("quarantined").as("disposition"),
        col("_failed_rules").as("failed_rules")))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_expect_scan" -> lakeExpectScan _,
    "lake_replace_scan" -> lakeReplaceScan _,
    "lake_convert_scan" -> lakeConvertScan _,
    "lake_table_changes" -> lakeTableChanges _,
    "lake_copy_into" -> lakeCopyInto _,
    "lake_incr_view" -> lakeIncrViewScan _,
    "lake_join_view" -> lakeJoinViewScan _,
    "lake_join_view_minmax" -> lakeJoinViewMinMax _,
    "lake_join_view_distinct" -> lakeJoinViewDistinct _,
    "lake_join_view_snowflake" -> lakeJoinViewSnowflake _,
    "lake_join_view_filtered" -> lakeJoinViewFiltered _,
    "lake_view_route_discovery" -> lakeViewRouteDiscovery _,
    "lake_rowid_scan" -> lakeRowIdScan _,
    "lake_widen_scan" -> lakeWidenScan _,
    "lake_delete_scan" -> lakeDeleteScan _,
    "lake_dv_scan" -> lakeDvScan _,
    "lake_update_scan" -> lakeUpdateScan _,
    "lake_cdf_feed" -> lakeCdfFeed _,
    "lake_cdf_stream" -> lakeCdfStream _,
    "lake_restore_scan" -> lakeRestoreScan _)

  /** The streaming drain replays the batch feed bit-for-bit, so the
    * two queries share one oracle body.
    */
  private val cdfOracleSql =
    """WITH split AS (
      |  SELECT CAST(floor(max(s_suppkey) / 2.0) AS BIGINT) AS k FROM supplier)
      |SELECT s_suppkey, s_name, _change_type, _commit_version FROM (
      |  SELECT s_suppkey, s_name, 'insert' AS _change_type,
      |         CAST(0 AS BIGINT) AS _commit_version
      |  FROM supplier WHERE s_suppkey <= (SELECT k FROM split)
      |  UNION ALL
      |  SELECT s_suppkey, s_name, 'insert', CAST(1 AS BIGINT)
      |  FROM supplier WHERE s_suppkey > (SELECT k FROM split)
      |  UNION ALL
      |  SELECT s_suppkey, s_name, 'delete', CAST(2 AS BIGINT)
      |  FROM supplier WHERE s_nationkey = 3)
      |ORDER BY _commit_version, s_suppkey, _change_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "lake_expect_scan" ->
      raw"""WITH toks AS (
           |  SELECT doc_id,
           |         CAST(len(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS tc
           |  FROM documents)
           |SELECT doc_id,
           |       CASE WHEN tc >= 30 THEN 'kept' ELSE 'quarantined' END AS disposition,
           |       CASE WHEN tc >= 30 THEN '' ELSE 'r_short' END AS failed_rules
           |FROM toks ORDER BY doc_id""".stripMargin,
    "lake_replace_scan" ->
      """SELECT o_orderkey, o_orderstatus,
        |       CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 1000.0
        |            ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "lake_table_changes" ->
      """WITH u AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice + 100000.0
        |              ELSE o_totalprice END AS p
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'insert' AS _change_type, count(*) AS cnt,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |         CAST(0 AS BIGINT) AS min_v, CAST(1 AS BIGINT) AS max_v
        |  FROM orders
        |  UNION ALL
        |  SELECT 'update_preimage', count(*),
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        |         CAST(2 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM orders WHERE o_orderkey % 997 = 0
        |  UNION ALL
        |  SELECT 'update_postimage', count(*),
        |         CAST(SUM(CAST(o_totalprice + 100000.0 AS DECIMAL(18,2))) AS DOUBLE),
        |         CAST(2 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM orders WHERE o_orderkey % 997 = 0
        |  UNION ALL
        |  SELECT 'delete', count(*),
        |         CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE),
        |         CAST(3 AS BIGINT), CAST(3 AS BIGINT)
        |  FROM u WHERE o_orderkey % 501 = 0
        |) ORDER BY _change_type""".stripMargin,
    "lake_copy_into" ->
      """SELECT c_nationkey,
        |       count(*) AS cnt,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |       max(c_custkey) AS max_cust
        |FROM customer
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "lake_convert_scan" ->
      """SELECT s_nationkey,
        |       count(*) AS cnt,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |       min(s_suppkey) AS min_supp
        |FROM supplier
        |WHERE NOT (s_acctbal < 0.0)
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "lake_incr_view" ->
      """WITH s AS (
        |  SELECT o_custkey,
        |         CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice + 1000.0
        |              ELSE o_totalprice END AS p
        |  FROM orders
        |  WHERE NOT (o_orderkey % 991 = 0))
        |SELECT o_custkey,
        |       count(*) AS cnt,
        |       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       MAX(p) AS max_price
        |FROM s GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "lake_join_view" ->
      """WITH s AS (
        |  SELECT o_custkey,
        |         CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice + 1000.0
        |              ELSE o_totalprice END AS p
        |  FROM orders
        |  WHERE NOT (o_orderkey % 991 = 0))
        |SELECT c_nationkey,
        |       count(*) AS cnt,
        |       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM s JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "lake_join_view_minmax" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice + 100000.0
        |              ELSE o_totalprice END AS p
        |  FROM orders),
        |s AS (
        |  SELECT * FROM u
        |  WHERE NOT (p > (SELECT max(p) * CAST(0.98 AS DOUBLE) FROM u)))
        |SELECT c_nationkey,
        |       count(*) AS cnt,
        |       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(CAST(p AS DECIMAL(18,2))) AS avg_price,
        |       max(p) AS max_price,
        |       min(o_orderkey) AS min_order
        |FROM s JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "lake_join_view_distinct" ->
      """SELECT c_nationkey,
        |       count(*) AS cnt,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS du,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 991 <> 0
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "lake_join_view_snowflake" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice + 100000.0
        |              ELSE o_totalprice END AS p
        |  FROM orders),
        |s AS (
        |  SELECT * FROM u
        |  WHERE NOT (p > (SELECT max(p) * CAST(0.98 AS DOUBLE) FROM u)))
        |SELECT n_name,
        |       count(*) AS cnt,
        |       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       max(p) AS max_price
        |FROM s
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "lake_join_view_filtered" ->
      """SELECT c_nationkey,
        |       count(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       max(o_totalprice) AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey < 13
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "lake_view_route_discovery" ->
      """SELECT c_nationkey,
        |       count(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       max(o_totalprice) AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey >= 13
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "lake_rowid_scan" ->
      """SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS _row_id,
        |       c_custkey, c_nationkey,
        |       CASE WHEN c_nationkey < 5 THEN c_acctbal + 1000.0
        |            ELSE c_acctbal END AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "lake_widen_scan" ->
      """SELECT p_partkey,
        |       CAST(p_size AS BIGINT) AS p_size,
        |       CASE WHEN p_partkey % 3 = 1 THEN p_retailprice
        |            ELSE CAST(CAST(p_retailprice AS REAL) AS DOUBLE)
        |       END AS p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "lake_delete_scan" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
        |ORDER BY o_orderkey""".stripMargin,
    "lake_dv_scan" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
        |WHERE NOT (c_acctbal < 0) AND NOT (c_nationkey = 5)
        |ORDER BY c_custkey""".stripMargin,
    "lake_update_scan" ->
      """SELECT c_custkey, c_nationkey,
        |       CASE WHEN c_nationkey < 5 THEN c_acctbal + 1000.0
        |            ELSE c_acctbal END AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "lake_cdf_feed" -> cdfOracleSql,
    "lake_cdf_stream" -> cdfOracleSql,
    "lake_restore_scan" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")
}
