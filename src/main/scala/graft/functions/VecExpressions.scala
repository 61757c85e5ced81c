package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for Σ aᵢ·bᵢ over ARRAY<FLOAT|DOUBLE>.
  *
  * Why an Expression and not zip_with+aggregate: higher-order
  * functions are CodegenFallback — every element goes through
  * interpreted eval with boxing. This node generates a tight primitive
  * loop inside whole-stage codegen (doGenCode), which is the hot inner
  * loop of similarity search: at 100 TB the dot product runs
  * rows × dim times and is exactly the thing to keep in codegen.
  *
  * Semantics match the HOF formulation bit-for-bit: elements cast to
  * double (exact for floats), products accumulated left-to-right in
  * double, so swapping implementations cannot change verified results.
  * Length mismatch → null (defensive; corpus vectors are fixed-dim).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  // Length mismatch / null element produce null even when both inputs
  // are non-null; without this the non-nullable codegen branch would
  // assign an undeclared isNull and the interpreted path would violate
  // the declared non-nullability (downstream unsafe projections could
  // silently coerce the null to 0.0).
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null element ⇒ null result (matches the HOF formulation, where
      // null * y poisons the whole fold — keeps the optimizer rewrite
      // RewriteVecDot semantics-preserving)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Column wrapper: Σ aᵢ·bᵢ in double, left-to-right. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
