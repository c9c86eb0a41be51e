package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with whole-stage codegen for the
  * engine's hot paths (mandate preference order: native Expression >
  * UDF; SURVEY.md §2.11). The interpreted HOF forms in
  * [[ColumnFunctions]] remain as the cross-check reference — specs
  * assert value equality.
  */

/** Polynomial rolling hash h=(h*31+byte)%(1e9+7) over a string's
  * bytes, one tight codegen loop instead of an interpreted
  * aggregate-over-sequence fold (~50 expression-tree evals per char).
  * Byte-wise, which equals the HOF/oracle code-point form on ASCII
  * input (the driver corpus; multi-byte text would diverge — at 100 TB
  * you would standardize on bytes and xxhash64 anyway). */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % ColumnFunctions.HashP
      i += 1
    }
    h
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % ${ColumnFunctions.HashP}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  protected override def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** Dot product of two double arrays as one codegen loop — replaces
  * the aggregate(zip_with(...)) interpreted fold in the KNN path.
  * Left-to-right summation, bit-identical to the HOF form. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
