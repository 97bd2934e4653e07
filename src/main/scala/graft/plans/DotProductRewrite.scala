package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0, (acc, v) -> acc + v)
  *
  * and rewrite it to the codegen'd [[DotProductExpr]]. Users (and our
  * own HOF reference forms) writing the idiomatic `functions.aggregate`
  * fold get the fused-loop fast path without changing their code —
  * this is the "let Catalyst optimize" path for the one hot scalar
  * kernel the built-in optimizer cannot see through.
  *
  * Caveat (documented engine contract for embedding columns): the
  * rewrite assumes equal-length arrays with non-null elements.
  * zip_with pads the shorter side with nulls, which would propagate a
  * null product into the fold; DotProductExpr iterates the common
  * prefix instead. On well-formed fixed-dimension embedding data the
  * two are identical (pinned by SketchExprSpec / DotRewriteSpec).
  * Because that contract silently changes null/ragged-array semantics
  * of arbitrary user SQL, the rewrite is gated on
  * `spark.graft.rewrite.dotProduct` (default true) — set it false to
  * get exact zip_with/aggregate semantics back session-wide.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewrite.dotProduct"

  private def isElemRef(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case Cast(x: NamedLambdaVariable, DoubleType, _, _) => x.exprId == v.exprId
    case _ => false
  }

  private def isSupportedArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
      if zero == 0.0d &&
        isSupportedArray(a) && isSupportedArray(b) &&
        isElemRef(ml, x) && isElemRef(mr, y) &&
        al.isInstanceOf[NamedLambdaVariable] &&
        al.asInstanceOf[NamedLambdaVariable].exprId == acc.exprId &&
        ar.isInstanceOf[NamedLambdaVariable] &&
        ar.asInstanceOf[NamedLambdaVariable].exprId == v.exprId &&
        fin.exprId == fv.exprId =>
      DotProductExpr(a, b)
  }
}
