package graft.plans

import graft.functions.catalyst.{DotF32, RollingHash}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the portable higher-order-function
  * rendering of the float dot product into the native codegen
  * expression.
  *
  * Users (and the registration-free builder
  * [[graft.functions.VectorSql.spark.dotHof]]) can write the pure
  * built-in form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
  * cast(0 as double), (acc,v) -> acc+v)`; with graft's extensions
  * installed this rule substitutes [[DotF32]] — the same bitwise
  * result (NativeExprSpec proves equality of the two paths) evaluated
  * as a tight generated loop instead of interpreted lambda calls.
  *
  * Installed by `GraftExtensions` (injectOptimizerRule) and by
  * `GraftSession.local` via `spark.experimental.extraOptimizations`.
  */
object NativeExprRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(
              Multiply(
                Cast(x: NamedLambdaVariable, DoubleType, _, _),
                Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
              mulArgs, _)),
          zero,
          LambdaFunction(
            Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), addArgs, _),
          LambdaFunction(idBody: NamedLambdaVariable, idArgs, _))
          if isFloatArray(a) && isFloatArray(b) && isZeroDouble(zero) &&
            x.dataType == FloatType && y.dataType == FloatType &&
            // the lambdas must use BOTH of their own arguments in
            // order — else e.g. (x,y) -> x*x (sum of squares) or
            // (acc,v) -> acc+acc would silently rewrite to a dot
            // product of different values
            bindsArgs(mulArgs, x, y) && bindsArgs(addArgs, acc, v) &&
            idArgs.exists(_.exprId == idBody.exprId) =>
        DotF32(a, b)

      // rolling hash: aggregate(transform(sequence(1, length(s)),
      //   i -> ascii(substring(s, i, 1))), 0L,
      //   (h,c) -> (h*31 + c) % 1000000007)
      case ArrayAggregate(
          ArrayTransform(
            Sequence(Literal(1, IntegerType), Length(s1), None, _),
            LambdaFunction(
              Ascii(Substring(s2, i: NamedLambdaVariable, Literal(1, IntegerType))), tArgs, _)),
          zeroL,
          LambdaFunction(
            Remainder(
              Add(
                Multiply(h: NamedLambdaVariable, thirtyOne, _),
                Cast(c: NamedLambdaVariable, LongType, _, _), _),
              prime, _),
            mArgs, _),
          LambdaFunction(idBody: NamedLambdaVariable, idArgs, _))
          if s1.semanticEquals(s2) && isZeroLong(zeroL) &&
            isLongConst(thirtyOne, 31L) && isLongConst(prime, 1000000007L) &&
            tArgs.size == 1 && tArgs.head.exprId == i.exprId &&
            bindsArgs(mArgs, h, c) &&
            idArgs.exists(_.exprId == idBody.exprId) =>
        RollingHash(s1)
    }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The lambda's argument list is exactly (first, second) in order. */
  private def bindsArgs(args: Seq[NamedExpression],
                        first: NamedLambdaVariable,
                        second: NamedLambdaVariable): Boolean =
    args.size == 2 && args.head.exprId == first.exprId &&
      args(1).exprId == second.exprId

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Cast(Literal(0, IntegerType), DoubleType, _, _) => true
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }

  private def isZeroLong(e: Expression): Boolean = isLongConst(e, 0L)

  /** Constant folding may or may not have run before this rule, so a
    * long constant can appear either as cast(int-literal as bigint) or
    * as a folded bigint literal. */
  private def isLongConst(e: Expression, v: Long): Boolean = e match {
    case Cast(Literal(i: Int, IntegerType), LongType, _, _) => i.toLong == v
    case Literal(l: Long, LongType) => l == v
    case _ => false
  }
}
