package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's lambda HOFs (`aggregate`, `zip_with`) are CodegenFallback —
  * every row pays interpreted-lambda dispatch per element. For a
  * 100 TB ANN scan the dot product IS the inner loop, so it gets a real
  * Expression with `doGenCode`: a tight primitive double loop inside
  * whole-stage codegen, no virtual calls, no boxing.
  *
  * Lives under org.apache.spark.sql because the Column/Expression bridge
  * (ExpressionUtils) and AbstractDataType are private[sql] — the same
  * technique public Spark extension libraries use.
  */
object VectorExpressions {

  /** Σ a(i)·b(i) over two ARRAY<DOUBLE> columns (null if lengths differ).
    * Accumulates left-to-right in array order — the same fold order as
    * `aggregate(zip_with(...))`, so results are bit-identical to the HOF
    * formulation (and to the DuckDB oracle).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    // null on length mismatch even when both inputs are non-null — the
    // default child-derived nullability would drop that null
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        val n = x.numElements()
        while (i < n) {
          acc += x.getDouble(i) * y.getDouble(i)
          i += 1
        }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
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
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: dot product of two ARRAY<DOUBLE> columns. */
  def vecDot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Column API: L2 norm. */
  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(a, a))
  }
}
