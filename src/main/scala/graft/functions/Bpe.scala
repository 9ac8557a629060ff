package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (Sennrich et al., ACL 2016; the
  * GPT-2-style greedy APPLY semantics — public algorithm):
  *
  * A word starts as its sequence of single code points. Repeatedly, the
  * adjacent symbol pair with the LOWEST merge rank present anywhere in
  * the word is merged at every leftmost-non-overlapping occurrence; the
  * loop ends when no adjacent pair carries a rank. Words are independent
  * (a merge never crosses whitespace), so the whole-text encoding is the
  * concatenation of per-word encodings.
  *
  * The kernel runs inside whole-stage codegen (static call, no UDF
  * ser/de); the merge table rides the plan as a reference object — a
  * vocabulary is config, never data. Pass NORMALIZED text
  * ([[Text.normalize]]) so both engines see the identical symbol stream,
  * same contract as the winnow kernel. */
object BpeKernel {

  private val Sep = " " // rank-table key separator: words are split ON
                        // spaces, so no symbol can ever contain one and
                        // the "l r" key is collision-free by construction

  /** Build the rank lookup from merges in priority order. */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.nonEmpty && r.nonEmpty, s"empty merge symbol at rank $i")
      m.putIfAbsent(l + Sep + r, Integer.valueOf(i))
    }
    m
  }

  /** Greedy BPE of one word (see object doc for the exact semantics). */
  def encodeWord(word: String,
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    // split to code points (supplementary chars are one symbol)
    var syms = new java.util.ArrayList[String](word.length)
    var si = 0
    while (si < word.length) {
      val cp = word.codePointAt(si)
      syms.add(new String(Character.toChars(cp)))
      si += Character.charCount(cp)
    }
    var done = syms.size < 2
    while (!done) {
      // lowest rank present
      var best = Integer.MAX_VALUE
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms.get(i) + Sep + syms.get(i + 1))
        if (r != null && r.intValue < best) best = r.intValue
        i += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        // merge every leftmost-non-overlapping occurrence of the best pair
        val next = new java.util.ArrayList[String](syms.size)
        i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && {
            val r = ranks.get(syms.get(i) + Sep + syms.get(i + 1))
            r != null && r.intValue == best
          }) {
            next.add(syms.get(i) + syms.get(i + 1)); i += 2
          } else {
            next.add(syms.get(i)); i += 1
          }
        }
        syms = next
        done = syms.size < 2
      }
    }
    var j = 0
    while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
  }

  /** Whole-text encoding: per-whitespace-word BPE, concatenated. */
  def encode(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String](s.length / 2 + 1)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) encodeWord(s.substring(start, i), ranks, out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd BPE tokenizer expression: array<string> of subword tokens. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  private lazy val ranks = BpeKernel.ranksOf(merges)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    BpeKernel.encode(a.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, a => s"graft.functions.BpeKernel.encode($a, $r)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
}

object Bpe {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Subword tokens of a NORMALIZED string column under `merges` (rank
    * order). */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncodeExpr(expression(text), merges))
}
