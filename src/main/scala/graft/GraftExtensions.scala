package graft

import graft.functions.{CharNgramsExpr, DotProductExpr, LevenshteinCpExpr, MinHashSigExpr, PolyHashExpr, ShingleMinExpr, SimHashExpr, TokenHashesExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** size(transform(arr, λ)) ⇒ size(arr): transform is length-preserving
  * regardless of the lambda, so the (possibly expensive, non-codegen)
  * per-element evaluation is dead work when only the length is
  * consumed. This is exactly the shape the optimizer's inferred
  * `size(...) > 0` Generate filters produce over computed arrays
  * (see Dedup.minhashSignaturesQuery). */
object SizeOfTransformSimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayTransform(arr, _), legacy) => Size(arr, legacy)
    }
}

object GraftExtensions {
  /** Validate a SQL function argument that must be an integer literal
    * (e.g. an n-gram size baked into the expression at plan time),
    * with a clear analysis-time error instead of an internal
    * eval-on-unbound-reference crash. */
  /** Arity check with the function name in the error — a wrong-arity
    * SQL call must fail analysis cleanly, not throw an internal
    * IndexOutOfBoundsException from children(i). */
  private[graft] def arity(
      fn: String, children: Seq[Expression], n: Int): Seq[Expression] = {
    if (children.size != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${children.size}")
    children
  }

  private[graft] def intLiteralArg(fn: String, children: Seq[Expression], pos: Int): Int =
    children(pos) match {
      case e if e.foldable =>
        e.eval() match {
          case n: java.lang.Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"$fn: argument ${pos + 1} must be an integer literal, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a literal (constant-foldable), got $other")
    }
}

/** Engine extension point (mandate category (c)): SQL-registered
  * native functions + optimizer rules, activated with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHashExpr].getName, "graft_polyhash"),
      (children: Seq[Expression]) => PolyHashExpr(GraftExtensions.arity("graft_polyhash", children, 1).head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        val c = GraftExtensions.arity("graft_dot", children, 2); DotProductExpr(c(0), c(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNgramsExpr].getName, "graft_char_ngrams"),
      (children: Seq[Expression]) => CharNgramsExpr(
        GraftExtensions.arity("graft_char_ngrams", children, 2)(0),
        GraftExtensions.intLiteralArg("graft_char_ngrams", children, 1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_hashes"),
      new ExpressionInfo(classOf[TokenHashesExpr].getName, "graft_token_hashes"),
      (children: Seq[Expression]) => TokenHashesExpr(GraftExtensions.arity("graft_token_hashes", children, 1).head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => MinHashSigExpr(
        GraftExtensions.arity("graft_minhash_sig", children, 2)(0),
        GraftExtensions.intLiteralArg("graft_minhash_sig", children, 1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_min"),
      new ExpressionInfo(classOf[ShingleMinExpr].getName, "graft_shingle_min"),
      (children: Seq[Expression]) => ShingleMinExpr(GraftExtensions.arity("graft_shingle_min", children, 1).head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashExpr(GraftExtensions.arity("graft_simhash", children, 1).head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_levenshtein"),
      new ExpressionInfo(classOf[LevenshteinCpExpr].getName, "graft_levenshtein"),
      (children: Seq[Expression]) => {
        val c = GraftExtensions.arity("graft_levenshtein", children, 2); LevenshteinCpExpr(c(0), c(1))
      }))
    ext.injectOptimizerRule(_ => SizeOfTransformSimplification)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // SQL DML over lake tables: UPDATE / MERGE INTO / VERSION AS OF
    // lower onto the LakeTable ops (DELETE goes through the V2
    // table's SupportsDelete, no rule needed)
    ext.injectResolutionRule(s => new graft.sources.LakeSqlDmlRule(s))
    ext.injectPlannerStrategy(_ => graft.sources.LakeDmlStrategy)
    // SQL reads of snapshots needing row-level assembly (MoR deletes,
    // renames, pre-default files) lift onto the library read instead
    // of refusing; DML/write targets keep their V2 relation
    ext.injectResolutionRule(s => new graft.sources.MorReadLiftRule(s))
    // versioned views (S11g): read-side expansion of GraftCatalog view
    // references + the row-returning SHOW VIEWS command — the DDL half
    // intercepts in GraftSqlParser (stock analysis refuses V2-catalog
    // view statements before any injected rule could see them)
    ext.injectResolutionRule(s => new graft.sources.GraftViewRelationRule(s))
    ext.injectPlannerStrategy(_ => graft.sources.LakeRowsStrategy)
    // direct-path reads + VERSION AS OF time travel over lake tables
    ext.injectParser((s, p) => new graft.sources.GraftSqlParser(s, p))
    // Delta-shaped `table_changes(tbl, from[, to])` TVF — the SQL
    // route into the lake's version-pair change feed (round 14);
    // `table_changes_with_lineage` adds the row-lineage keyed diff.
    // Refusal contracts ride the library calls unchanged.
    ext.injectTableFunction((
      new FunctionIdentifier("table_changes"),
      new ExpressionInfo(
        graft.sources.GraftTableChanges.getClass.getName, "table_changes"),
      (args: Seq[Expression]) =>
        graft.sources.GraftTableChanges.plan(lineage = false, args)))
    ext.injectTableFunction((
      new FunctionIdentifier("table_changes_with_lineage"),
      new ExpressionInfo(
        graft.sources.GraftTableChanges.getClass.getName,
        "table_changes_with_lineage"),
      (args: Seq[Expression]) =>
        graft.sources.GraftTableChanges.plan(lineage = true, args)))
    // `table_appends(tbl, from[, to])` — the appendsBetween twin
    // (S16a): pure-append incremental scan, O(appended files); any
    // non-append commit in range refuses by name.
    ext.injectTableFunction((
      new FunctionIdentifier("table_appends"),
      new ExpressionInfo(
        graft.sources.GraftTableChanges.getClass.getName, "table_appends"),
      (args: Seq[Expression]) =>
        graft.sources.GraftTableChanges.plan("table_appends", args)))
  }
}
