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
    val syms = new java.util.ArrayList[String](word.length)
    var si = 0
    while (si < word.length) {
      val cp = word.codePointAt(si)
      syms.add(new String(Character.toChars(cp)))
      si += Character.charCount(cp)
    }
    mergeSymbols(syms, ranks, out)
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

  // ---- Byte-level mode (GPT-2 form; Radford et al. 2019 — public) --------
  //
  // Whitespace-split BPE over raw Unicode has two failure modes the
  // byte-level form fixes: every unseen code point becomes an
  // unmergeable singleton token (no <unk>, but the vocabulary can never
  // cover it), and punctuation glues to words ("word." is a different
  // word than "word"). Byte level: the PRETOKENIZER splits text into
  // linguistic units (contractions, space-prefixed words/numbers/
  // punctuation runs, whitespace), each pretoken's UTF-8 BYTES map
  // through a fixed 256-entry bijection into printable chars (space →
  // 'Ġ' is the famous one), and merges operate over that 256-symbol
  // alphabet — so any text, any script, any emoji is representable and
  // decode is exact byte reversal. Encode contract: RAW text (the
  // pretokenizer owns segmentation; no Text.normalize — byte-level BPE
  // is case- and whitespace-faithful by design).

  /** The GPT-2 pretokenizer (public contract): contractions, then
    * space?-prefixed letter runs, digit runs, other-symbol runs, then
    * whitespace (a run keeps its last space attached to the following
    * word via the lookahead). `\p{L}`/`\p{N}`/`\s` are Unicode classes
    * (UNICODE_CHARACTER_CLASS); matches concatenate to the input
    * exactly, so encode∘decode is lossless for ANY string. */
  val Pretokenizer: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Pretoken list of `s` (exposed for specs; concatenation == s). */
  def pretokenize(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val m = Pretokenizer.matcher(s)
    while (m.find()) out.add(m.group())
    out
  }

  /** byte → printable-char bijection: the 188 "displayable" bytes
    * ('!'..'~', '¡'..'¬', '®'..'ÿ') map to themselves; the other 68
    * shift to 256+k in first-seen order (so 0x20 → U+0120 'Ġ',
    * 0x0A → U+010A 'Ċ'). Every image is a single UTF-16 char. */
  val byteToChar: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    val map = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) map(b) = b.toChar
      else { map(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    map
  }

  // -1 marks a char that is NOT a byte image (e.g. a literal space, or any
  // char >= 324): decode rejects it loudly instead of AIOOBE / silent NUL
  private val charToByte: Array[Int] = {
    val inv = Array.fill(324)(-1) // max image is 256+67 = 323
    var b = 0
    while (b < 256) { inv(byteToChar(b)) = b; b += 1 }
    inv
  }

  /** Greedy merge loop shared by both modes (object doc semantics). */
  private def mergeSymbols(syms0: java.util.ArrayList[String],
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    var syms = syms0
    var done = syms.size < 2
    while (!done) {
      var best = Integer.MAX_VALUE
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms.get(i) + Sep + syms.get(i + 1))
        if (r != null && r.intValue < best) best = r.intValue
        i += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
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

  /** Byte-level whole-text encoding: pretokenize, map each pretoken's
    * UTF-8 bytes through [[byteToChar]], merge per pretoken. */
  def encodeByteLevel(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String](s.length / 2 + 1)
    val m = Pretokenizer.matcher(s)
    while (m.find()) {
      val bytes = m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val syms = new java.util.ArrayList[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        syms.add(String.valueOf(byteToChar(bytes(i) & 0xff)))
        i += 1
      }
      mergeSymbols(syms, ranks, out)
    }
    new GenericArrayData(out.toArray)
  }

  /** Exact inverse of [[encodeByteLevel]] under ANY merge table:
    * concatenate tokens, map chars back to bytes, UTF-8 decode. A token
    * containing any char outside the [[byteToChar]] alphabet (a
    * word-level token passed by mistake, a literal space) fails with the
    * offending char named — a contract error, never a silent NUL byte. */
  def decodeByteLevel(tokens: ArrayData): UTF8String = {
    val sb = new StringBuilder()
    var i = 0
    while (i < tokens.numElements()) {
      sb.append(tokens.getUTF8String(i).toString)
      i += 1
    }
    val s = sb.toString
    val bytes = new Array[Byte](s.length)
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j)
      val b = if (c < 324) charToByte(c) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"not a byte-level BPE token stream: char '$c' (U+${c.toInt.toHexString
          .toUpperCase}) at position $j is outside the byte alphabet — " +
          "decodeByteLevel only inverts encodeByteLevel output")
      bytes(j) = b.toByte
      j += 1
    }
    UTF8String.fromString(
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
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

/** Codegen'd BYTE-LEVEL BPE tokenizer: array<string> of subword tokens
  * over the [[BpeKernel.byteToChar]] alphabet. Takes RAW text — the
  * GPT-2 pretokenizer owns segmentation. */
case class BpeByteEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  private lazy val ranks = BpeKernel.ranksOf(merges)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    BpeKernel.encodeByteLevel(a.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, a => s"graft.functions.BpeKernel.encodeByteLevel($a, $r)")
  }
  override protected def withNewChildInternal(c: Expression): BpeByteEncodeExpr =
    copy(child = c)
}

/** Codegen'd byte-level decode: array<string> of tokens → the exact
  * original string (byte reversal; lossless under any merge table). */
case class BpeByteDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any): Any =
    BpeKernel.decodeByteLevel(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.BpeKernel.decodeByteLevel($a)")
  override protected def withNewChildInternal(c: Expression): BpeByteDecodeExpr =
    copy(child = c)
}

object Bpe {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Subword tokens of a NORMALIZED string column under `merges` (rank
    * order). */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncodeExpr(expression(text), merges))

  /** Byte-level subword tokens of a RAW string column under `merges`
    * (rank order, symbols in the byte-level alphabet — e.g. a leading
    * space rides as 'Ġ'). Case-, punctuation- and whitespace-faithful;
    * any code point is representable; [[decodeByteLevel]] inverts
    * exactly. */
  def tokensByteLevel(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeByteEncodeExpr(expression(text), merges))

  /** Exact inverse of [[tokensByteLevel]]: array of byte-level tokens →
    * the original string. */
  def decodeByteLevel(tokens: Column): Column =
    column(BpeByteDecodeExpr(expression(tokens)))
}
