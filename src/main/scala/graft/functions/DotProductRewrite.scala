package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  * into the codegen'd [[DoubleDotProduct]] native expression.
  *
  * Higher-order functions evaluate their lambdas interpreted (outside
  * whole-stage codegen), which dominates brute-force O(n²·d) similarity
  * scans — the native expression is ~20x faster (VectorExpressions
  * scaladoc). With this rule a user can write the idiomatic declarative
  * form and still get the native loop; this is the `Rule[LogicalPlan]`
  * extension tier of SURVEY.md §2.2 doing real work, injected via
  * [[GraftExtensions]] (or `experimentalMethods.extraOptimizations` on
  * an existing session — [[GraftFunctions.register]]).
  *
  * Semantics preserved EXACTLY, which is why the guards matter:
  *  - element type must be DOUBLE (any nullability): the rewrite
  *    targets [[DoubleDotProduct]]'s zip_with mode, which reproduces
  *    the HOF contract — null result on length mismatch (zip_with pads
  *    with nulls) and on any null element (a null product nulls the
  *    whole fold);
  *  - the multiply must be over exactly the zip_with lambda's two
  *    variables and the fold must be `acc + v` from zero 0.0 with an
  *    identity finish — anything else is not a dot product.
  * Both evaluate left-to-right double accumulation, so results are
  * bit-identical (ParitySpec-grade, same guarantee the manual call
  * sites rely on).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean =
    a match {
      case v: NamedLambdaVariable => v.exprId == b.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable,
                y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aacc, av, _), Seq(acc: NamedLambdaVariable,
              v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isDoubleArray(a) && isDoubleArray(b) &&
            sameVar(mx, x) && sameVar(my, y) &&
            sameVar(aacc, acc) && sameVar(av, v) && sameVar(fin, fv) =>
        DoubleDotProduct(a, b, zipWithSemantics = true)
    }
}
