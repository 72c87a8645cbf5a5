package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.expressions.FloatVectorDot

/** Optimizer rule: rewrite the HOF dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * over float arrays into the native codegen'd [[FloatVectorDot]].
  * ArrayAggregate/ZipWith are CodegenFallback (interpreted lambda
  * evaluation + a zipped intermediate array per row); the native
  * expression is a primitive loop inside whole-stage codegen with the
  * SAME sequential fold order, so the rewrite is bit-exact — users who
  * write the portable HOF form get the fast path for free.
  *
  * Registered via `GraftExtensions` (spark.sql.extensions) or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Strip widening casts to double (the idiom casts each element). */
  private def strip(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => strip(c)
    case _ => e
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    strip(e) match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(m @ Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) &&
          // Bit-exactness guard: only rewrite when the product itself is
          // computed in DOUBLE (`(double) x * (double) y`). A bare
          // `x * y` multiplies in FLOAT and rounds before the add —
          // differs by ULPs from FloatVectorDot's double*double product.
          m.dataType == DoubleType &&
          ((sameVar(ml, x) && sameVar(mr, y)) || (sameVar(ml, y) && sameVar(mr, x))) &&
          ((sameVar(al, acc) && sameVar(ar, v)) || (sameVar(al, v) && sameVar(ar, acc))) &&
          sameVar(fin, fv) =>
      FloatVectorDot(a, b)
  }
}

/** Entry point for `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
}
