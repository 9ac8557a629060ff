package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.array_sort
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Custom Catalyst expression: |A ∩ B| over two SORTED long arrays via a
  * two-pointer merge — no per-row hash-set construction, no boxing of the
  * array elements (reads straight out of the unsafe array format).
  *
  * Why custom: `size(array_intersect(a, b))` builds a hash set per
  * invocation; for pairwise similarity joins (millions of pairs per bucket)
  * that constant factor dominates the whole query. The merge-count over
  * pre-sorted distinct arrays is the right physical operator, and Spark has
  * no built-in for it — this is preference order (b) from the design notes:
  * a scalar Expression, not a planner change.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  // Stays inside whole-stage codegen (a CodegenFallback here would drop the
  // entire join stage to interpreted evaluation — the original hotspot).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $i = 0, $j = 0;
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        int ${ev.value}_c = 0;
        while ($i < $nx && $j < $ny) {
          final long $xv = $a.getLong($i);
          final long $yv = $b.getLong($j);
          if ($xv == $yv) { ${ev.value}_c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = ${ev.value}_c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ArrayOps {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column wrapper: count of common elements of two sorted array<long>. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))

  /** Sorted hashed-shingle representation ready for pairwise intersection. */
  def sortedShingleHashes(text: Column, n: Int): Column =
    array_sort(Text.shingleHashes(text, n))

  /** Same over a staged token-array column — one-pass kernel (sorted
    * distinct 60-bit hashes emitted directly; see TextKernels). */
  def sortedShingleHashesOfTokens(toks: Column, n: Int): Column =
    TextKernels.shingleHashes(toks, n)

  /** Composed-expression reference form (kept for bitwise cross-checks). */
  def sortedShingleHashesOfTokensRef(toks: Column, n: Int): Column =
    array_sort(Text.shingleHashesOfTokens(toks, n))
}
