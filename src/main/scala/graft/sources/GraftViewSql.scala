package graft.sources

import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL wiring for VERSIONED VIEWS (S11g). Spark 4.1 DECLARES the
  * public `ViewCatalog` connector interface but its analyzer never
  * calls it — `ResolveSessionCatalog` refuses every view statement
  * aimed at a V2 catalog with MISSING_CATALOG_ABILITY before any
  * injected resolution rule can run. So, exactly like Iceberg's
  * runtime does for the same gap, the extension supplies the two
  * missing halves itself:
  *
  *  - DDL (CREATE/REPLACE/ALTER/DROP/SHOW VIEWS) intercepts at the
  *    injected PARSER ([[GraftSqlParser.viewStatement]]) — the only
  *    hook that runs before the refusing built-in rule — and lowers
  *    onto the catalog's own [[ViewCatalog]] methods, so the SQL
  *    surface and the library surface are the same code path.
  *  - READ resolution ([[GraftViewRelationRule]], injected as a
  *    resolution rule): an [[UnresolvedRelation]] naming a view of a
  *    [[GraftCatalog]] expands to its stored SQL, re-parsed and
  *    QUALIFIED under the view's frozen (catalog, namespace) context,
  *    so the body keeps meaning what it meant at CREATE time no
  *    matter where the reading session sits. Built-in relation
  *    resolution simply leaves unknown names unresolved, which is
  *    what lets this rule pick them up in the same fixpoint batch.
  */
object GraftViewSql {

  /** Max nested view expansion — the same backstop depth Spark uses
    * for session-catalog views; a cycle refuses by name instead of
    * spinning the analyzer to its iteration cap. */
  private val MaxDepth = 32

  private[sources] def viewCatalogOf(
      spark: SparkSession, catName: String): Option[GraftCatalog] =
    GraftSqlShim.catalogPlugin(spark, catName)
      .collect { case g: GraftCatalog => g }

  /** (catalog, identifier, view) when `parts` names a live view in a
    * registered [[GraftCatalog]] — the shared probe of the DDL and
    * read paths. */
  private[sources] def viewAt(spark: SparkSession, parts: Seq[String])
      : Option[(GraftCatalog, Identifier, View)] = parts match {
    case cat +: rest if rest.nonEmpty =>
      viewCatalogOf(spark, cat).flatMap { g =>
        val ident = Identifier.of(rest.init.toArray, rest.last)
        if (g.viewExists(ident)) Some((g, ident, g.loadView(ident))) else None
      }
    case _ => None
  }

  /** Expand every view reference in `plan`, recursively, carrying the
    * expansion path so a view cycle refuses by name. Nested subquery
    * expressions (EXISTS/IN/scalar) expand too. A FRESH materialized
    * view resolves to its storage table instead of its query
    * ([[GraftMaterializedViews.freshStoragePlan]]); a stale one falls
    * back to the always-correct expansion. */
  private[sources] def expandViews(
      spark: SparkSession, plan: LogicalPlan,
      stack: List[String]): LogicalPlan = {
    val mapped = plan match {
      // VERSION AS OF on a VIEW: replay that VERSION'S DEFINITION over
      // current data — exactly what the immutable version files
      // promise ("what did this view compute last Tuesday"). A leaf
      // node holding the relation as a FIELD, so it needs its own arm;
      // TIMESTAMP AS OF refuses by name (versions are the contract).
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        (tt.relation match {
          case u: UnresolvedRelation =>
            viewAt(spark, u.multipartIdentifier).map(v => (u, v))
          case _ => None
        }) match {
          case Some((u, (g, ident, _))) =>
            require(tt.version.nonEmpty,
              s"view time travel on $ident supports VERSION AS OF only " +
                "(view versions are the audit contract; see v.versions)")
            val p = g.warehousePathOf(ident)
            val v = tt.version.get.toIntOption.getOrElse(
              throw new IllegalArgumentException(
                s"view version must be an integer, got '${tt.version.get}'"))
            require(GraftViews.versions(p).contains(v),
              s"no version $v of view $ident — see ${ident.name}.versions")
            val m = GraftViews.load(p, v)
            val key = (u.multipartIdentifier.head +: ident.namespace :+
              ident.name).mkString(".") + s"@v$v"
            require(!stack.contains(key), s"view cycle detected at $key")
            val body = spark.sessionState.sqlParser.parsePlan(m.sql)
            SubqueryAlias(ident.name, expandViews(spark,
              qualify(body, m.currentCatalog, m.currentNamespace), key :: stack))
          case None => tt
        }
      case u: UnresolvedRelation =>
        viewAt(spark, u.multipartIdentifier) match {
          case Some((g, ident, view)) =>
            val key = (u.multipartIdentifier.head +: ident.namespace :+ ident.name)
              .mkString(".")
            require(!stack.contains(key),
              s"view cycle detected: ${(key :: stack).reverse.mkString(" -> ")}")
            require(stack.size < MaxDepth,
              s"view nesting exceeds $MaxDepth levels at $key")
            GraftMaterializedViews.freshStoragePlan(spark, g, ident, view)
              .getOrElse {
                val body = spark.sessionState.sqlParser.parsePlan(view.query)
                val qualified = qualify(body, view.currentCatalog,
                  view.currentNamespace.toSeq)
                SubqueryAlias(ident.name,
                  expandViews(spark, qualified, key :: stack))
              }
          case None => u
        }
      case other =>
        other.withNewChildren(other.children.map(expandViews(spark, _, stack)))
    }
    mapped.transformExpressions {
      case s: SubqueryExpression =>
        s.withNewPlan(expandViews(spark, s.plan, stack))
    }
  }

  /** The view's body as a resolved frame, under its frozen context —
    * what REFRESH recomputes and what a stale materialized read falls
    * back to. */
  private[sources] def resolvedBody(
      spark: SparkSession, view: View, selfKey: String)
      : org.apache.spark.sql.DataFrame = {
    val body = spark.sessionState.sqlParser.parsePlan(view.query)
    val qualified = qualify(body, view.currentCatalog,
      view.currentNamespace.toSeq)
    GraftSqlShim.ofRows(spark, expandViews(spark, qualified, List(selfKey)))
  }

  /** [[qualify]] for the materialized-view machinery. */
  private[sources] def qualifiedPlan(
      plan: LogicalPlan, cat: String, ns: Seq[String]): LogicalPlan =
    qualify(plan, cat, ns)

  /** Re-anchor the parsed view body in its CREATE-time context:
    * single-part table names resolve under the stored catalog +
    * namespace (that is what "stored context" means); longer names
    * are already explicit and pass through. */
  private def qualify(
      plan: LogicalPlan, cat: String, ns: Seq[String]): LogicalPlan = {
    def fix(p: LogicalPlan): LogicalPlan = {
      val mapped = p match {
        case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
          UnresolvedRelation(
            (cat +: ns :+ u.multipartIdentifier.head).toIndexedSeq,
            u.options, u.isStreaming)
        case other => other.withNewChildren(other.children.map(fix))
      }
      mapped.transformExpressions {
        case s: SubqueryExpression => s.withNewPlan(fix(s.plan))
      }
    }
    fix(plan)
  }

  /** CREATE [OR REPLACE] VIEW through the catalog: the body analyzes
    * NOW, in the creator's context (that analysis is what freezes the
    * schema the View reports), then commits as the next version. A
    * materialized create ALSO refuses untrackable sources and runs
    * the initial refresh, so the view is born fresh. */
  private[sources] def createView(
      spark: SparkSession, g: GraftCatalog, ident: Identifier,
      body: String, replace: Boolean, ifNotExists: Boolean,
      materialized: Boolean = false): Int = {
    if (ifNotExists && g.viewExists(ident)) return 0
    val schema = GraftSqlShim.ofRows(
      spark, spark.sessionState.sqlParser.parsePlan(body)).schema
    val (curCat, curNs) = GraftSqlShim.currentContext(spark)
    val props: java.util.Map[String, String] =
      if (!materialized) java.util.Collections.emptyMap()
      else java.util.Collections.singletonMap(
        GraftMaterializedViews.MaterializedProp, "true")
    val info = new ViewInfo(ident, body, curCat, curNs.toArray, schema,
      schema.fieldNames, Array.empty[String], Array.empty[String], props)
    if (replace) g.replaceView(info, true) else g.createView(info)
    if (materialized) GraftMaterializedViews.refresh(spark, g, ident)
    0
  }
}

/** A command that RETURNS rows (SHOW VIEWS) — [[LakeDmlCommand]]'s
  * row-producing sibling; the effect runs at execution, never at
  * parse/analysis (EXPLAIN must stay side-effect-free). */
case class LakeRowsCommand(
    sql: String, attrNames: Seq[String], rows: () => Seq[Seq[String]])
    extends LeafNode with Command {
  override def output: Seq[Attribute] =
    attrNames.map(n => AttributeReference(n, StringType, nullable = false)())
  override def simpleString(maxFields: Int): String = s"LakeRowsCommand $sql"
}

case class LakeRowsExec(
    sql: String, output: Seq[Attribute], rows: () => Seq[Seq[String]])
    extends LeafExecNode {
  override def executeCollect(): Array[InternalRow] =
    rows().map(r => InternalRow.fromSeq(r.map(UTF8String.fromString)))
      .toArray
  override protected def doExecute()
      : org.apache.spark.rdd.RDD[InternalRow] =
    sparkContext.parallelize(executeCollect().toSeq, 1)
}

object LakeRowsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LakeRowsCommand(sql, _, rows) =>
      LakeRowsExec(sql, plan.output, rows) :: Nil
    case _ => Nil
  }
}

/** Injected resolution rule: expands [[GraftCatalog]] view references
  * left unresolved by the built-in relation resolution. */
class GraftViewRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // cheap bail: no unresolved relations anywhere (subqueries
    // included; RelationTimeTravel HOLDS its relation as a field, so
    // it needs its own arm), nothing to expand
    val hasUnresolved = plan.collectWithSubqueries {
      case u: UnresolvedRelation => u
      case t: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel => t
    }.nonEmpty
    if (!hasUnresolved) plan
    else GraftViewSql.expandViews(spark, plan, Nil)
  }
}
