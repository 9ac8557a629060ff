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

/** Product-quantization encoder: all `m` per-subspace argmins in ONE pass
  * over the vector — `codebooks(s)(code)(d)` rides the expression as a
  * codegen reference object, the row's floats are read in place (no
  * per-subspace slice arrays), output is the `array<int>` of codes. Each
  * subspace uses exactly [[NearestCentroidF]]'s arithmetic contract
  * (float→double widening, difference squared by multiplication,
  * index-order accumulation, strict `<` ⇒ lowest code wins ties) over its
  * own dimension window, so an oracle engine slicing the vector and
  * replaying the argmin per subspace lands on identical codes. */
case class PqEncodeF(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "PqEncodeF needs at least one codebook entry per subspace")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val codes = new Array[Int](codebooks.length)
    var off = 0
    var s = 0
    while (s < codebooks.length) {
      val book = codebooks(s)
      val dsub = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        val n = math.min(dsub, x.numElements() - off)
        while (i < n) {
          val t = x.getFloat(off + i).toDouble - cent(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      off += dsub
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val books = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val codes = ctx.freshName("codes"); val off = ctx.freshName("off")
      val s = ctx.freshName("s"); val book = ctx.freshName("book")
      val dsub = ctx.freshName("dsub"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val c = ctx.freshName("c")
      val cent = ctx.freshName("cent"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      s"""
        final int[] $codes = new int[$books.length];
        int $off = 0;
        for (int $s = 0; $s < $books.length; $s++) {
          final double[][] $book = $books[$s];
          final int $dsub = $book[0].length;
          int $best = 0;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $book.length; $c++) {
            final double[] $cent = $book[$c];
            final int $n = java.lang.Math.min($dsub, $a.numElements() - $off);
            double $d = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              final double $t = (double) $a.getFloat($off + $i) - $cent[$i];
              $d += $t * $t;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          $codes[$s] = $best;
          $off += $dsub;
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeF =
    copy(child = newChild)
}

/** Asymmetric-distance lookup for a PQ code row: `table(s)(code)` holds the
  * query's exact index-order squared L2 to subspace `s`'s codebook entry
  * `code` (computed ONCE on the driver per query), so the per-row distance
  * is `m` array lookups summed in subspace order — equal, term for term,
  * to the index-order L2 between the query and the row's RECONSTRUCTION,
  * which is what lets an oracle replay it from the codebooks. A code
  * outside the table (a row encoded under a different model) fails loudly
  * with the offending subspace and code. */
case class PqAdcF(child: Expression, table: Array[Array[Double]])
    extends UnaryExpression {

  require(table.nonEmpty, "PqAdcF needs a per-subspace lookup table")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val m = math.min(table.length, codes.numElements())
    var d = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= table(s).length)
        throw new IllegalArgumentException(
          s"PqAdcF: code $c out of range for subspace $s " +
            s"(codebook size ${table(s).length}) — row encoded under a " +
            "different PQ model?")
      d += table(s)(c)
      s += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tab = ctx.addReferenceObj("table", table, "double[][]")
      val s = ctx.freshName("s"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      s"""
        final int $m = java.lang.Math.min($tab.length, $a.numElements());
        double $d = 0.0;
        for (int $s = 0; $s < $m; $s++) {
          final int $c = $a.getInt($s);
          if ($c < 0 || $c >= $tab[$s].length) {
            throw new IllegalArgumentException(
              "PqAdcF: code " + $c + " out of range for subspace " + $s +
              " (codebook size " + $tab[$s].length +
              ") — row encoded under a different PQ model?");
          }
          $d += $tab[$s][$c];
        }
        ${ev.value} = $d;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcF =
    copy(child = newChild)
}

/** Asymmetric PQ distance computed directly from the RAW query vector —
  * the batch-ADC kernel: per row, for each subspace `s`, accumulate
  * `||q_sub − codebooks(s)(code_s)||²`. Bit-equal to [[PqAdcF]] over
  * `adcTable(q)` (the single-query path precomputes per-subspace tables
  * once; here the query varies per ROW — a multi-query join — so the
  * distance folds the reconstruction directly: d multiply-adds per row,
  * the cost of one plain vector distance, still codegen'd). Inputs:
  * codes `array<int>`, query `array<double>` (cast upstream). A code out
  * of range or a query shorter than the codebook dims fails loudly —
  * both mean rows and model diverged. */
case class PqAdcQueryF(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "PqAdcQueryF needs at least one codebook entry per subspace")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(codesAny: Any, qAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = qAny.asInstanceOf[ArrayData]
    val m = math.min(codebooks.length, codes.numElements())
    var d = 0.0; var off = 0; var s = 0
    while (s < m) {
      val book = codebooks(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= book.length)
        throw new IllegalArgumentException(
          s"PqAdcQueryF: code $c out of range for subspace $s " +
            s"(codebook size ${book.length}) — row encoded under a " +
            "different PQ model?")
      val cent = book(c)
      if (off + cent.length > q.numElements())
        throw new IllegalArgumentException(
          s"PqAdcQueryF: query has ${q.numElements()} dims, codebooks " +
            s"need ${codebooks.map(_(0).length).sum}")
      var j = 0
      while (j < cent.length) {
        val t = q.getDouble(off + j) - cent(j); d += t * t; j += 1
      }
      off += cent.length
      s += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, q) => {
      val books = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val s = ctx.freshName("s"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val off = ctx.freshName("off"); val j = ctx.freshName("j")
      val cent = ctx.freshName("cent"); val t = ctx.freshName("t")
      s"""
        final int $m = java.lang.Math.min($books.length, $a.numElements());
        double $d = 0.0;
        int $off = 0;
        for (int $s = 0; $s < $m; $s++) {
          final int $c = $a.getInt($s);
          if ($c < 0 || $c >= $books[$s].length) {
            throw new IllegalArgumentException(
              "PqAdcQueryF: code " + $c + " out of range for subspace " + $s +
              " (codebook size " + $books[$s].length +
              ") — row encoded under a different PQ model?");
          }
          final double[] $cent = $books[$s][$c];
          if ($off + $cent.length > $q.numElements()) {
            throw new IllegalArgumentException(
              "PqAdcQueryF: query has " + $q.numElements() +
              " dims, fewer than the codebooks cover");
          }
          for (int $j = 0; $j < $cent.length; $j++) {
            final double $t = $q.getDouble($off + $j) - $cent[$j];
            $d += $t * $t;
          }
          $off += $cent.length;
        }
        ${ev.value} = $d;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcQueryF =
    copy(left = newLeft, right = newRight)
}
