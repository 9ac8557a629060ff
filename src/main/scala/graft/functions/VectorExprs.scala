package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

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

/** Index of the nearest centroid (squared L2, strict `<` ⇒ lowest index
  * wins ties) for an array<float> vector against a FIXED centroid matrix.
  * The matrix rides the expression as a codegen reference object — one
  * broadcast-free map-side argmin per row, the inner loop of every Lloyd
  * iteration and of IVF cell routing. Arithmetic contract shared with the
  * oracle: each element widened float→double, the difference squared by
  * MULTIPLICATION (not pow), accumulated in index order — so distances are
  * bit-identical to the SQL `list_sum(list_transform(…))` formulation and
  * argmin comparisons agree exactly across engines.
  */
case class NearestCentroidF(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "NearestCentroidF needs at least one centroid")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(x.numElements(), cent.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val t = x.getFloat(i).toDouble - cent(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val t = ctx.freshName("t"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val cent = ctx.freshName("cent")
      s"""
        int $best = 0;
        double $bestD = Double.MAX_VALUE;
        for (int $c = 0; $c < $mat.length; $c++) {
          final double[] $cent = $mat[$c];
          final int $n = java.lang.Math.min($a.numElements(), $cent.length);
          double $d = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $t = (double) $a.getFloat($i) - $cent[$i];
            $d += $t * $t;
          }
          if ($d < $bestD) { $bestD = $d; $best = $c; }
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidF =
    copy(child = newChild)
}
