package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.ArrayDot

/** Optimizer rule: fuse the composed dot-product pattern
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`
  * into the allocation-free `ArrayDot` codegen expression.
  *
  * Sound because ArrayDot reproduces the composition's null semantics
  * (null on length mismatch or null element) and accumulates in the
  * same index order — users writing the idiomatic functional form get
  * the fast path transparently. Injected by GraftExtensions.
  */
object FuseArrayDot extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx, my, _), Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
        zero @ Literal(_, DoubleType),
        LambdaFunction(Add(ax, av, _), Seq(facc: NamedLambdaVariable, fv: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(farg: NamedLambdaVariable), _))
      if zero.value == 0.0 &&
         a.dataType.isInstanceOf[ArrayType] &&
         a.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
         b.dataType.isInstanceOf[ArrayType] &&
         b.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
         // multiply of exactly the two zip variables (either order)
         ((isVar(mx, zx) && isVar(my, zy)) || (isVar(mx, zy) && isVar(my, zx))) &&
         // fold is acc+v (either order)
         ((isVar(ax, facc) && isVar(av, fv)) || (isVar(ax, fv) && isVar(av, facc))) &&
         // finish is the identity lambda
         isVar(fin, farg) =>
      ArrayDot(a, b)
  }
}
