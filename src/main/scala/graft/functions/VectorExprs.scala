package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd vector kernels over array<float> embeddings. Spark's
  * higher-order functions (zip_with/aggregate/transform) have no doGenCode —
  * they run interpreted with per-element boxing, which dominates pairwise
  * similarity joins. These expressions produce the EXACT same doubles
  * (elements widened float→double, accumulated in index order) as the
  * higher-order formulations and as the oracle's list_sum(list_transform(…))
  * — but as a tight primitive loop inside whole-stage codegen.
  *
  * Contract: elements are non-null (embedding vectors); a null ELEMENT would
  * read as 0.0 rather than propagating NULL.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
        final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double ${ev.value}_s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          ${ev.value}_s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = ${ev.value}_s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an array<float> (double accumulation, index order). */
case class NormL2F(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
        final int $n = $a.numElements();
        double ${ev.value}_s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double $v = (double) $a.getFloat($i);
          ${ev.value}_s += $v * $v;
        }
        ${ev.value} = java.lang.Math.sqrt(${ev.value}_s);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NormL2F =
    copy(child = newChild)
}
