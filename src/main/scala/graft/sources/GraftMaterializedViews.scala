package graft.sources

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.{Identifier, View}

/** MATERIALIZED VIEWS (S11j) — the Iceberg-MV shape: a versioned view
  * ([[GraftViews]]) plus a STORAGE lake table holding the
  * precomputed result plus a FRESHNESS record (every source table's
  * version at refresh time) in the view's properties. Reads resolve
  * to the storage table while every source still sits at its
  * recorded version — O(result) instead of O(sources) — and fall
  * back to the always-correct query expansion the moment any source
  * moves (Iceberg's "stale = recompute through the view" mode: a
  * materialized view may serve stale data only by explicit opt-in,
  * which this engine does not offer). REFRESH recomputes the body
  * under the view's frozen context, overwrites the storage table
  * (one lake commit — time travel over refresh history for free),
  * and commits a new VIEW version carrying the new freshness record,
  * so `v.versions` audits refreshes exactly like definition changes.
  *
  * Freshness is version-equality, which is why CREATE refuses a body
  * whose relations are not version-trackable lake tables (a temp
  * view or raw file source has no version to record — serving
  * storage against it could silently serve stale data, the one thing
  * a non-opt-in MV must never do). At 100 TB the freshness probe is
  * O(#sources) metadata reads; the read itself lists only the
  * storage table's files. */
object GraftMaterializedViews {

  private[sources] val MaterializedProp = "graft.materialized"
  private[sources] val SourcesProp = "graft.mv.sources"
  private[sources] val RefreshModeProp = "graft.mv.refreshMode"

  private[sources] def storagePath(viewPath: String): String =
    s"$viewPath/_graft_mv_storage"

  private def fmtSources(ss: Seq[(String, Int)]): String =
    ss.sortBy(_._1).map { case (p, v) => s"$p=$v" }.mkString("\n")

  private def parseSources(props: Map[String, String]): Seq[(String, Int)] =
    props.get(SourcesProp).toSeq.flatMap(_.split("\n").toSeq)
      .filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf('=')
        (line.substring(0, i), line.substring(i + 1).toInt)
      }

  /** Every SOURCE lake table of the view body, with its CURRENT
    * version — the freshness basis. Nested views recurse to their
    * underlying tables; any relation that is not a version-trackable
    * lake table (temp view, raw file) refuses BY NAME. */
  private[sources] def sourceVersions(
      spark: SparkSession, view: View, selfKey: String): Seq[(String, Int)] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def walk(plan: LogicalPlan, stack: List[String]): Unit = {
      plan.foreach {
        case u: UnresolvedRelation =>
          val parts = u.multipartIdentifier
          GraftViewSql.viewAt(spark, parts) match {
            case Some((_, ident, inner)) =>
              val key = (parts.head +: ident.namespace :+ ident.name).mkString(".")
              require(!stack.contains(key), s"view cycle at $key")
              walk(qualifiedBody(spark, inner), key :: stack)
            case None =>
              val table = parts match {
                case cat +: rest if rest.nonEmpty =>
                  GraftSqlShim.catalogPlugin(spark, cat).collect {
                    case g: GraftCatalog => g.lakeTablePath(rest)
                  }.flatten
                case _ => None
              }
              val p = table.getOrElse(throw new IllegalArgumentException(
                s"materialized view: source ${parts.mkString(".")} is not a " +
                  "version-trackable lake table — freshness cannot be " +
                  "decided, so materialization refuses (a plain VIEW works)"))
              seen.getOrElseUpdate(p, LakeTable.latestVersion(p).getOrElse(-1))
          }
        case _ => ()
      }
      plan.foreach(_.expressions.foreach(_.foreach {
        case s: SubqueryExpression => walk(s.plan, stack)
        case _ => ()
      }))
    }
    walk(qualifiedBody(spark, view), List(selfKey))
    require(seen.nonEmpty,
      "materialized view: the body references no lake table — nothing to " +
        "track freshness against")
    seen.toSeq
  }

  private def qualifiedBody(spark: SparkSession, view: View): LogicalPlan =
    GraftViewSql.qualifiedPlan(
      spark.sessionState.sqlParser.parsePlan(view.query),
      view.currentCatalog, view.currentNamespace.toSeq)

  private[sources] def isFresh(view: View, viewPath: String): Boolean = {
    import scala.jdk.CollectionConverters._
    val recorded = parseSources(view.properties.asScala.toMap)
    recorded.nonEmpty &&
      recorded.forall { case (p, v) => LakeTable.latestVersion(p).contains(v) } &&
      LakeTable.latestVersion(storagePath(viewPath)).nonEmpty
  }

  /** The storage table's plan when `view` is a FRESH materialized
    * view — what the read-side expansion serves; None = plain view or
    * stale (expand the query). */
  private[sources] def freshStoragePlan(
      spark: SparkSession, g: GraftCatalog, ident: Identifier,
      view: View): Option[LogicalPlan] = {
    if (view.properties.get(MaterializedProp) != "true") return None
    val p = g.warehousePathOf(ident)
    if (!isFresh(view, p)) return None
    Some(SubqueryAlias(ident.name,
      GraftSqlShim.analyzedPlan(LakeTable.read(spark, storagePath(p)))))
  }

  /** Driver query: MATERIALIZED VIEW lifecycle (S11j) — fresh reads
    * provably serve the STORAGE table, a source commit provably flips
    * the NEXT read to the query expansion (current answers, never
    * stale storage), REFRESH re-arms storage; all three phases'
    * rollups are the oracle surface and the plan provenance of each
    * phase is require'd in-query. */
  def materializedViewQuery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val wh = s"/tmp/graft_lakemv_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(wh)
    s.conf.set("spark.sql.catalog.graft_m", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_m.warehouse", wh)
    graft.Tables.load(s, d, "events").select("event_id", "event_type", "value")
      .createOrReplaceTempView("mv_ev_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_m.mvdb")
    s.sql("CREATE TABLE graft_m.mvdb.ev " +
      "(event_id BIGINT, event_type STRING, value DOUBLE) USING graftlake")
    s.sql("INSERT INTO graft_m.mvdb.ev " +
      "SELECT * FROM mv_ev_src WHERE event_id % 2 = 0")
    s.sql("CREATE MATERIALIZED VIEW graft_m.mvdb.stats AS " +
      "SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value " +
      "FROM graft_m.mvdb.ev GROUP BY event_type")
    def phase(name: String) = s.sql(
      "SELECT event_type, n, sum_value FROM graft_m.mvdb.stats")
      .withColumn("phase", lit(name))
    val fresh = phase("fresh")
    require(fresh.inputFiles.nonEmpty &&
        fresh.inputFiles.forall(_.contains("_graft_mv_storage")),
      "a fresh materialized read must list ONLY storage files")
    s.sql("INSERT INTO graft_m.mvdb.ev " +
      "SELECT * FROM mv_ev_src WHERE event_id % 2 = 1")
    val stale = phase("stale")
    require(!stale.queryExecution.analyzed.toString.contains("_graft_mv_storage"),
      "a stale materialized view must recompute through the query")
    s.sql("REFRESH MATERIALIZED VIEW graft_m.mvdb.stats")
    val refreshed = phase("refreshed")
    require(refreshed.inputFiles.nonEmpty &&
        refreshed.inputFiles.forall(_.contains("_graft_mv_storage")),
      "a refreshed materialized read must serve storage again")
    fresh.unionByName(stale).unionByName(refreshed)
      .select("phase", "event_type", "n", "sum_value")
      .orderBy("phase", "event_type")
  }

  /** (key columns, merge columns name→kind) when the ANALYZED body is
    * one Aggregate whose every output is a grouping expression or a
    * directly-aliased DISTRIBUTIVE aggregate — sum over long/double
    * (decimal sums widen precision on re-aggregation, so they fall
    * back), count, min, max; FILTER clauses are fine (they apply
    * inside the delta partial), DISTINCT is not distributive. Every
    * grouping expression must also surface as an output column —
    * merging by the outputs would otherwise collapse distinct groups.
    * None = not incrementally maintainable. */
  private def mergeSpecOf(plan: LogicalPlan)
      : Option[(Seq[String], Seq[(String, String)])] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.{DoubleType, LongType}
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => unwrap(c)
      case other => other
    }
    unwrap(plan) match {
      case a: Aggregate =>
        val keys = Seq.newBuilder[String]
        val merges = Seq.newBuilder[(String, String)]
        var nMerges = 0
        val ok = a.aggregateExpressions.forall {
          case al: Alias => al.child match {
            case e if a.groupingExpressions.exists(_.semanticEquals(e)) =>
              keys += al.name; true
            case AggregateExpression(fn, _, false, _, _) =>
              val kind = fn match {
                case s: Sum
                    if s.dataType == LongType || s.dataType == DoubleType =>
                  Some("sum")
                case _: Count => Some("sum")
                case _: Min => Some("min")
                case _: Max => Some("max")
                case _ => None
              }
              kind.foreach { k => merges += al.name -> k; nMerges += 1 }
              kind.isDefined
            case _ => false
          }
          case ar: AttributeReference
              if a.groupingExpressions.exists(_.semanticEquals(ar)) =>
            keys += ar.name; true
          case _ => false
        }
        val covered = a.groupingExpressions.forall(gx =>
          a.aggregateExpressions.exists {
            case al: Alias => al.child.semanticEquals(gx)
            case e: AttributeReference => e.semanticEquals(gx)
            case _ => false
          })
        if (ok && covered && nMerges > 0) Some((keys.result(), merges.result()))
        else None
      case _ => None
    }
  }

  /** The parsed+qualified body with its ONE direct lake-table relation
    * replaced by `delta` — "the body over the appended rows". None when
    * the body is anything else (nested views, self-joins, subqueries,
    * other relations): classic IVM needs more than delta substitution
    * there, so REFRESH recomputes in full. */
  private def deltaBodyOf(
      spark: SparkSession, view: View, srcPath: String,
      delta: DataFrame): Option[DataFrame] = {
    val parsed = qualifiedBody(spark, view)
    var subqueries = false
    parsed.foreach(p => p.expressions.foreach(_.foreach {
      case _: SubqueryExpression => subqueries = true
      case _ => ()
    }))
    def resolvesToSrc(u: UnresolvedRelation): Boolean =
      u.multipartIdentifier match {
        case cat +: rest if rest.nonEmpty =>
          GraftViewSql.viewAt(spark, u.multipartIdentifier).isEmpty &&
            GraftSqlShim.catalogPlugin(spark, cat).collect {
              case gc: GraftCatalog => gc.lakeTablePath(rest)
            }.flatten.contains(srcPath)
        case _ => false
      }
    var hits = 0
    var others = false
    parsed.foreach {
      case u: UnresolvedRelation =>
        if (resolvesToSrc(u)) hits += 1 else others = true
      case _ => ()
    }
    if (subqueries || others || hits != 1) return None
    val deltaPlan = GraftSqlShim.analyzedPlan(delta)
    Some(GraftSqlShim.ofRows(spark, parsed.transformUp {
      case u: UnresolvedRelation if resolvesToSrc(u) =>
        SubqueryAlias(u.multipartIdentifier.last, deltaPlan)
    }))
  }

  /** INCREMENTAL refresh — incremental view maintenance for
    * distributive aggregates: when the body is ONE direct lake table
    * aggregated with sum/count/min/max and the source moved by PURE
    * APPENDS since the recorded freshness version, recompute the body
    * over [[LakeTable.appendsBetween]]'s delta alone and fold it into
    * the stored result group-wise (union + re-aggregate with the merge
    * function of each column: partial counts add, partial min/max
    * compose) — O(appended data + |result|) instead of O(source).
    * Anything else — DML/overwrite/compact in range (appendsBetween
    * refuses by name), joins, nested views, subqueries, non-
    * distributive aggregates — returns false and REFRESH falls back to
    * the always-correct full recompute. The merge is side-effect-free
    * until the final overwrite: any surprise (schema drift, analysis
    * failure) abandons the fast path before a byte of storage moves. */
  private def tryIncremental(
      spark: SparkSession, view: View, selfKey: String,
      recorded: Seq[(String, Int)], current: Seq[(String, Int)],
      viewPath: String): Boolean = {
    if (recorded.size != 1 || current.size != 1) return false
    val (srcPath, fromV) = recorded.head
    val (curPath, toV) = current.head
    if (srcPath != curPath || fromV >= toV) return false
    val stor = storagePath(viewPath)
    if (LakeTable.latestVersion(stor).isEmpty) return false
    val merged: Option[DataFrame] =
      try {
        val delta = LakeTable.appendsBetween(spark, srcPath, fromV, toV)
        val analyzed = GraftSqlShim.analyzedPlan(
          GraftViewSql.resolvedBody(spark, view, selfKey))
        mergeSpecOf(analyzed).flatMap { case (keys, mergeCols) =>
          deltaBodyOf(spark, view, srcPath, delta).flatMap { deltaAgg =>
            import org.apache.spark.sql.functions.{col, max, min, sum}
            val storage = LakeTable.read(spark, stor)
            val cols = storage.columns.toSeq
            val union = storage.select(cols.map(col): _*)
              .unionByName(deltaAgg.select(cols.map(col): _*))
            val aggs = mergeCols.map { case (n, k) =>
              (k match {
                case "min" => min(col(n))
                case "max" => max(col(n))
                case _ => sum(col(n))
              }).as(n)
            }
            val m = union.groupBy(keys.map(col): _*)
              .agg(aggs.head, aggs.tail: _*).select(cols.map(col): _*)
            def shape(df: DataFrame) =
              df.schema.fields.toSeq.map(f => (f.name, f.dataType))
            if (shape(m) == shape(storage)) Some(m) else None
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    merged match {
      case Some(m) => LakeTable.overwrite(m, stor); true
      case None => false
    }
  }

  /** The refresh path the LAST refresh took ("incremental" | "full") —
    * read off the latest view version's properties; refresh cost is
    * auditable from `v.versions` like any other view mutation. */
  def lastRefreshMode(g: GraftCatalog, ident: Identifier): Option[String] = {
    val p = g.warehousePathOf(ident)
    GraftViews.latest(p)
      .flatMap(v => GraftViews.load(p, v).properties.get(RefreshModeProp))
  }

  /** Driver query: INCREMENTAL MV refresh lifecycle — a pure-append
    * source commit provably refreshes through the O(delta) fold (mode
    * recorded on the view version), a DML commit provably falls back
    * to the full recompute, and both phases' rollups are the oracle
    * surface; the incremental phase is additionally cross-checked
    * in-query against the direct recompute (the fold must be
    * invisible in the answer). */
  def incrementalMvQuery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, sum}
    val wh = s"/tmp/graft_lakemvi_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.Util.rmRecursive(wh)
    s.conf.set("spark.sql.catalog.graft_mi", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_mi.warehouse", wh)
    graft.Tables.load(s, d, "events").select("event_id", "event_type", "value")
      .createOrReplaceTempView("mvi_ev_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_mi.mvdb")
    s.sql("CREATE TABLE graft_mi.mvdb.ev " +
      "(event_id BIGINT, event_type STRING, value DOUBLE) USING graftlake")
    s.sql("INSERT INTO graft_mi.mvdb.ev " +
      "SELECT * FROM mvi_ev_src WHERE event_id % 2 = 0")
    s.sql("CREATE MATERIALIZED VIEW graft_mi.mvdb.agg AS " +
      "SELECT event_type, count(*) AS n, sum(value) AS sv, " +
      "min(event_id) AS mn, max(event_id) AS mx " +
      "FROM graft_mi.mvdb.ev GROUP BY event_type")
    val g = GraftSqlShim.catalogPlugin(s, "graft_mi")
      .collect { case c: GraftCatalog => c }.get
    val ident = Identifier.of(Array("mvdb"), "agg")
    def mode = lastRefreshMode(g, ident)
    require(mode.contains("full"),
      s"the CREATE-time initial refresh must record mode=full, got $mode")
    // phase 1: a pure append refreshes through the O(delta) fold
    s.sql("INSERT INTO graft_mi.mvdb.ev " +
      "SELECT * FROM mvi_ev_src WHERE event_id % 2 = 1")
    s.sql("REFRESH MATERIALIZED VIEW graft_mi.mvdb.agg")
    require(mode.contains("incremental"),
      s"a pure-append refresh must take the incremental path, got $mode")
    def phase(name: String) = s.sql(
      "SELECT event_type, n, round(sv, 6) AS sv, mn, mx " +
        "FROM graft_mi.mvdb.agg").withColumn("phase", lit(name))
    val inc = phase("incremental")
    require(inc.inputFiles.nonEmpty &&
        inc.inputFiles.forall(_.contains("_graft_mv_storage")),
      "the incrementally-refreshed read must serve storage")
    val direct = s.sql(
      "SELECT event_type, count(*) AS n, round(sum(value), 6) AS sv, " +
        "min(event_id) AS mn, max(event_id) AS mx " +
        "FROM graft_mi.mvdb.ev GROUP BY event_type")
    // multiset equality in ONE signed-count aggregation instead of two
    // exceptAll isEmpty probes (each an EXCEPT ALL rewrite = union +
    // replication generate + its own action — guide §2.4)
    val incBare = inc.drop("phase")
    val gateCols = incBare.columns.toSeq
    require(incBare.withColumn("__side", lit(1L))
        .unionAll(direct.toDF(gateCols: _*).withColumn("__side", lit(-1L)))
        .groupBy(gateCols.map(col): _*)
        .agg(sum(col("__side")).as("__d")).filter(col("__d") =!= 0L)
        .isEmpty,
      "the incremental fold must equal the direct recompute exactly")
    // phase 2: DML in range breaks the append chain → full recompute
    s.sql("UPDATE graft_mi.mvdb.ev SET value = value + 1 " +
      "WHERE event_id % 7 = 0")
    s.sql("REFRESH MATERIALIZED VIEW graft_mi.mvdb.agg")
    require(mode.contains("full"),
      s"a refresh across DML must fall back to the full recompute, got $mode")
    inc.unionByName(phase("after_update"))
      .select("phase", "event_type", "n", "sv", "mn", "mx")
      .orderBy("phase", "event_type")
  }

  /** REFRESH: recompute the body under the frozen context — via the
    * O(delta) incremental fold when [[tryIncremental]] applies, else
    * in full — overwrite the storage table, commit a new VIEW version
    * carrying the new freshness record plus the path taken
    * ([[RefreshModeProp]]). A refresh of an already-fresh view is a
    * no-op (returns false). */
  def refresh(spark: SparkSession, g: GraftCatalog, ident: Identifier): Boolean = {
    val p = g.warehousePathOf(ident)
    val v = GraftViews.latest(p).getOrElse(throw new IllegalArgumentException(
      s"no view at $ident"))
    val meta = GraftViews.load(p, v)
    require(meta.properties.get(MaterializedProp).contains("true"),
      s"REFRESH MATERIALIZED VIEW $ident: '$ident' is a plain view")
    val view = g.loadView(ident)
    if (isFresh(view, p)) return false
    val selfKey = (g.name() +: ident.namespace :+ ident.name).mkString(".")
    // record source versions BEFORE the recompute: a source committing
    // mid-refresh leaves the record behind its head → still stale →
    // the next read falls back to the query, never serves stale
    val sources = sourceVersions(spark, view, selfKey)
    val mode =
      if (tryIncremental(spark, view, selfKey,
          parseSources(meta.properties), sources, p)) "incremental"
      else {
        val df = GraftViewSql.resolvedBody(spark, view, selfKey)
        LakeTable.overwrite(df, storagePath(p))
        "full"
      }
    // a REPLACE racing this refresh must not get OLD-sql freshness
    // recorded over it: refuse the record (storage then reads as
    // stale — the fallback recomputes, nothing serves wrong data)
    require(GraftViews.latest(p).contains(v),
      s"view $ident changed concurrently during REFRESH — " +
        "freshness not recorded; re-run REFRESH")
    GraftViews.commit(p, meta.copy(
      properties = meta.properties + (SourcesProp -> fmtSources(sources)) +
        (RefreshModeProp -> mode),
      committedAtMs = System.currentTimeMillis()))
    true
  }
}
