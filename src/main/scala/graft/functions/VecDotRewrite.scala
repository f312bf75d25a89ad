package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the interpreted higher-order dot-product
  * idiom to the native codegen'd [[VecDot]] kernel —
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *
  * becomes `vec_dot(a, b)`, including when either side is wrapped in
  * the element-widening `transform(arr, x -> double(x))` (VecDot widens
  * internally, so the transform is stripped). This is the form SQL /
  * Column users naturally write — the docs for every similarity
  * operator started from it — and the semantics are bit-identical
  * (same IEEE op order, same null/length behavior; VecDotSpec pins
  * that equivalence), so the rewrite is purely a physical win: the
  * per-element lambda interpreter becomes a fused primitive loop.
  *
  * Deliberately conservative: the multiply must be exactly the two
  * lambda variables at double type (a float-typed multiply rounds
  * differently and is left alone), the zero must be literal 0.0d, the
  * merge must be `acc + v` in that order, and the finish must be the
  * identity — anything else is not the idiom and is not touched.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  /** An array usable as a VecDot input with unchanged semantics: either
    * element type double as-is, or `transform(arr, x -> cast(x as
    * double))` over a float/double array (strip the transform — VecDot
    * widens each element itself). */
  private object DotInput {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(arr, LambdaFunction(body, Seq(v: NamedLambdaVariable), _))
          if isCastToDouble(body, v) && isFloatOrDoubleArray(arr) =>
        Some(arr)
      case _ if e.dataType.isInstanceOf[ArrayType] &&
          e.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        Some(e)
      case _ => None
    }

    private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(t, _) =>
        t == DoubleType || t == org.apache.spark.sql.types.FloatType
      case _ => false
    }

    private def isCastToDouble(body: Expression, v: NamedLambdaVariable): Boolean =
      body match {
        case c: Cast => c.dataType == DoubleType && (c.child match {
          case nv: NamedLambdaVariable => nv.exprId == v.exprId
          case _ => false
        })
        case _ => false
      }
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
        ZipWith(DotInput(l), DotInput(r),
          LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
      if m.dataType == DoubleType &&
        sameVar(m.left, x) && sameVar(m.right, y) &&
        sameVar(a.left, acc) && sameVar(a.right, v) &&
        sameVar(fin, fv) =>
      VecDot(l, r)
  }
}
