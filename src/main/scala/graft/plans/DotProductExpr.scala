package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two array columns (float or double
  * elements), accumulated in doubles in index order.
  *
  * Numerically identical to the declarative
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  * (acc, x) -> acc + x)` left fold (the form the DuckDB oracle
  * mirrors — see operators.OracleSql.dotFold): same element order,
  * same double accumulator, so results stay hash-comparable. The HOF
  * form evaluates interpreted (higher-order functions block
  * whole-stage codegen and allocate a lambda frame per element); this
  * expression compiles to a tight fused multiply-add loop inside the
  * enclosing WholeStageCodegen stage — the difference is ~10× on the
  * ANN scan paths, which at 100 TB is the entire search cost.
  *
  * Assumes non-null elements (embedding vectors); null input arrays
  * yield null via the standard null-safe binary contract. If the
  * arrays differ in length the shorter length is used, matching
  * zip_with-with-cast semantics for the non-padded prefix.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elemGetter(t: DataType): String = t match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(
      s"graft_dot supports array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires array<float|double> inputs, got ${left.dataType} and ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val leftDouble = left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    val rightDouble = right.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightDouble) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = elemGetter(left.dataType)
    val getR = elemGetter(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
