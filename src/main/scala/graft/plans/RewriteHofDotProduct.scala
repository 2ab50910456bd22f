package graft.plans

import graft.functions.FloatDotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order dot product
  *
  * {{{ aggregate(zip_with(x, y, (p, q) -> p * q), 0.0, (acc, v) -> acc + v) }}}
  *
  * (with optional per-element casts to double — the exact tree
  * `Dedup.dot` and SQL users build) into the native codegen'd
  * [[FloatDotProduct]]. Higher-order lambdas evaluate interpreted —
  * per element they box and re-enter the lambda evaluator — while the
  * native expression is a primitive loop inside whole-stage codegen;
  * same "declare intent, let the optimizer pick the machine" contract
  * as Catalyst's own rewrites, registered through
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions).
  *
  * Semantics contract (FloatDotProduct's own): equal-length arrays
  * with non-null elements — the embedding-table invariant. On
  * MISMATCHED lengths the HOF form returns null (zip_with pads with
  * nulls and the sum null-poisons) while the native form dots the
  * common prefix; null elements likewise diverge. Inputs that can
  * violate the contract should disable the rewrite via
  * `spark.graft.rewriteHofDot=false` (checked per query, so a running
  * session can toggle it).
  *
  * Matching is deliberately strict — literal double-zero seed,
  * multiply-of-the-two-lambda-variables (in either order, casts
  * stripped), add-of-the-two-lambda-variables, identity finish —
  * so near-miss aggregates (different seed, different combine) are
  * never touched.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewriteHofDot"

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case _ => e
  }

  /** `(p, q) -> p * q` (casts stripped, either order) over exactly the
    * lambda's own two variables.
    */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply,
        Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      (stripDoubleCast(m.left), stripDoubleCast(m.right)) match {
        case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
          (l.exprId == p.exprId && r.exprId == q.exprId) ||
            (l.exprId == q.exprId && r.exprId == p.exprId)
        case _ => false
      }
    case _ => false
  }

  /** `(acc, v) -> acc + v` (either order) over the lambda's own
    * variables.
    */
  private def isPlainSum(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add,
        Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      (a.left, a.right) match {
        case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
          (l.exprId == p.exprId && r.exprId == q.exprId) ||
            (l.exprId == q.exprId && r.exprId == p.exprId)
        case _ => false
      }
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(p: NamedLambdaVariable), _) => v.exprId == p.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformAllExpressions {
      case agg @ ArrayAggregate(zw: ZipWith, Literal(0.0, DoubleType), merge, finish)
          if isFloatArray(zw.left) && isFloatArray(zw.right) &&
            isPairwiseMultiply(zw.function) && isPlainSum(merge) &&
            isIdentity(finish) =>
        FloatDotProduct(zw.left, zw.right)
    }
}
