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

  /** REFRESH: recompute the body under the frozen context, overwrite
    * the storage table, commit a new VIEW version carrying the new
    * freshness record. A refresh of an already-fresh view is a
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
    val df = GraftViewSql.resolvedBody(spark, view, selfKey)
    LakeTable.overwrite(df, storagePath(p))
    // a REPLACE racing this refresh must not get OLD-sql freshness
    // recorded over it: refuse the record (storage then reads as
    // stale — the fallback recomputes, nothing serves wrong data)
    require(GraftViews.latest(p).contains(v),
      s"view $ident changed concurrently during REFRESH — " +
        "freshness not recorded; re-run REFRESH")
    GraftViews.commit(p, meta.copy(
      properties = meta.properties + (SourcesProp -> fmtSources(sources)),
      committedAtMs = System.currentTimeMillis()))
    true
  }
}
