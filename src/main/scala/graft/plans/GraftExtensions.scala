package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.DotLong
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Engine extensions, injected via `SparkSessionExtensions`
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Currently one optimizer rule: [[DotProductRewrite]]. The operators in
  * graft.operators call [[DotLong]] explicitly, so the rule is not load-
  * bearing for them — it exists so *user-written* declarative plans
  * (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) get the codegen'd native
  * expression automatically, the way an engine should: declare the
  * semantics, let the optimizer pick the implementation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => DotProductRewrite)
}

/** Rewrites `aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, v) =>
  * acc + v)` over `array<long>` columns into [[DotLong]] — same exact
  * int64 arithmetic (higher-order functions evaluate interpreted;
  * DotLong is a primitive loop inside whole-stage codegen).
  *
  * Conservative by construction: the multiply/add operands must be
  * exactly the lambda variables (either order), the zero must be literal
  * 0L, the finish lambda must be the identity, and both inputs must be
  * `array<long>`. Anything else is left untouched.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** f is a two-variable lambda whose body is `op` applied to exactly its
    * two variables (either order).
    */
  private def isVarPairOp(f: Expression,
      op: (NamedLambdaVariable, NamedLambdaVariable) => PartialFunction[Expression, Boolean]): Boolean =
    f match {
      case LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
        op(x, y).applyOrElse(body, (_: Expression) => false)
      case _ => false
    }

  private def sameVars(a: Expression, b: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (a, b) match {
      case (av: NamedLambdaVariable, bv: NamedLambdaVariable) =>
        (av.exprId == x.exprId && bv.exprId == y.exprId) ||
          (av.exprId == y.exprId && bv.exprId == x.exprId)
      case _ => false
    }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(v: NamedLambdaVariable), _) =>
      body.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, mulF),
            Literal(0L, LongType),
            addF,
            finish)
          if isLongArray(a) && isLongArray(b) &&
            isVarPairOp(mulF, (x, y) => { case Multiply(l, r, _) => sameVars(l, r, x, y) }) &&
            isVarPairOp(addF, (x, y) => { case Add(l, r, _) => sameVars(l, r, x, y) }) &&
            isIdentity(finish) =>
        DotLong(a, b)
    }
}
