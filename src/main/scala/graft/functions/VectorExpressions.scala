package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric array columns as a native codegen'd Catalyst
  * expression.
  *
  * Why custom: `aggregate(zip_with(a, b, _*_), 0d, _+_)` expresses the same
  * thing but higher-order functions evaluate interpreted — per-element lambda
  * binding plus a per-pair ArrayData allocation. On an all-pairs similarity
  * join that interpreter overhead dominates the runtime by ~20×. This
  * expression compiles to a tight primitive loop inside whole-stage codegen,
  * which is exactly the "custom Expression beats UDF beats interpreted"
  * preference order the engine is built on.
  *
  * Semantics: element-wise multiply-accumulate over the common prefix length,
  * left-to-right (bit-identical to the sequential fold it replaces). Null
  * input → null; null ELEMENTS are not supported (embedding vectors are
  * dense).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<double>/array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everywhere: nullSafeExec emits this UNBRACED when the
      // children are non-nullable, so two DotProducts in one projection
      // would otherwise declare duplicate locals and fail Janino compile.
      val n = ctx.freshName("dpN")
      val s = ctx.freshName("dpSum")
      val i = ctx.freshName("dpI")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $lGet * $rGet; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2 norm via the same codegen'd loop. */
  def l2_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot_product(a, a))
}
