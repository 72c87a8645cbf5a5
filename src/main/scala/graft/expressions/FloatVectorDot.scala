package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two float-array columns
  * (SURVEY.md §2.11: the one place a custom Catalyst Expression beats
  * the built-ins).
  *
  * The HOF formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * allocates the zipped intermediate array per row and evaluates the
  * lambdas through interpreted HigherOrderFunction plumbing; this
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen — no allocation, no virtual calls — which matters when the
  * dot product sits inside an O(N·Q) similarity-search inner loop.
  *
  * Determinism contract (same as VectorOps.dot, which delegates here):
  * sequential index-order accumulation `acc += a[i] * b[i]` — one
  * IEEE-ordered fold, bit-identical to DuckDB's `list_reduce` twin and
  * to the HOF form it replaces. Never reorder into a tree/SIMD-style
  * reduction.
  *
  * Null handling matches the HOF idiom exactly (required for the
  * RewriteHofDotProduct rule to be semantics-preserving): a null array
  * yields null; arrays of UNEQUAL length yield null (zip_with would
  * null-pad and the fold would absorb the null); a null ELEMENT yields
  * null (null * x = null, acc + null = null).
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = DoubleType

  /** Always nullable: unequal lengths and null ELEMENTS yield null even
    * when both input arrays are themselves non-nullable, so inheriting
    * BinaryExpression's `left.nullable || right.nullable` would declare
    * a non-null contract this expression can violate (and make
    * nullSafeCodeGen emit `false = true;`). Matches the HOF idiom,
    * whose ArrayAggregate is likewise always nullable.
    */
  override def nullable: Boolean = true

  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}
