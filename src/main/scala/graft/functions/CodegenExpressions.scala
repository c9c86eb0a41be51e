package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with whole-stage codegen for the
  * engine's hot paths (mandate preference order: native Expression >
  * UDF; SURVEY.md §2.11). The interpreted HOF forms in
  * [[ColumnFunctions]] remain as the cross-check reference — specs
  * assert value equality.
  */

/** Static helpers shared by interpreted eval and generated code — one
  * implementation, so the two execution paths cannot drift. Methods are
  * reachable from janino-generated Java through the Scala static
  * forwarders of this object. */
object HashUtil {

  /** Polynomial rolling hash h=(h*31+codePoint)%(1e9+7) over a
    * string's UNICODE CODE POINTS — the same fold as the HOF form
    * (`ascii(substring(s,i,1))` = codePointAt) and the DuckDB oracles,
    * so native/HOF/oracle agree on ANY text, not just ASCII (the
    * reference's own corpus is CJK: `utils/data_preprocess.py:19-24`).
    * Decodes UTF-8 in place — no allocation. */
  def polyHashCp(s: UTF8String): Long = {
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xe0) { cp = b0 & 0x1f; len = 2 }
      else if (b0 < 0xf0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var k = 1
      while (k < len) { cp = (cp << 6) | (s.getByte(i + k) & 0x3f); k += 1 }
      h = (h * 31L + cp) % ColumnFunctions.HashP
      i += len
    }
    h
  }

  /** Character n-grams (by code point, matching `substring`'s
    * character indexing) as one tight loop — replaces the interpreted
    * transform(sequence(1, len-2), i -> substring(text, i, 3)) HOF,
    * whose per-element expression-tree evaluation dominated
    * lang_id_ngram's round-1 bench time. Byte offsets are walked once;
    * each gram is a byte-slice view over one shared copy. */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val nc = s.numChars()
    if (nc < n) return new GenericArrayData(new Array[Any](0))
    val numBytes = s.numBytes
    val offs = new Array[Int](nc + 1)
    var i = 0
    var c = 0
    while (i < numBytes) {
      offs(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
    }
    offs(c) = numBytes
    val bytes = s.getBytes
    val out = new Array[Any](nc - n + 1)
    var j = 0
    while (j <= nc - n) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Polynomial rolling hash over a string's code points (see
  * [[HashUtil.polyHashCp]]) as a native codegen expression — one
  * static-helper call per row instead of an interpreted
  * aggregate-over-sequence fold (~50 expression-tree evals per char). */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  protected override def nullSafeEval(input: Any): Any =
    HashUtil.polyHashCp(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.polyHashCp($c);")

  protected override def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** Character n-gram array (see [[HashUtil.charNgrams]]) as a native
  * codegen expression: `graft_char_ngrams(text, 3)` ==
  * `transform(sequence(1, length(text)-2), i -> substring(text, i, 3))`
  * (spec-asserted), at a fraction of the interpreted cost. */
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  protected override def nullSafeEval(input: Any): Any =
    HashUtil.charNgrams(input.asInstanceOf[UTF8String], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.charNgrams($c, $n);")

  protected override def withNewChildInternal(newChild: Expression): CharNgramsExpr =
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
