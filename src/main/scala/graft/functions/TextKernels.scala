package graft.functions

import java.security.MessageDigest
import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-hashing kernels. The composed-expression forms
  * (transform ∘ array_distinct ∘ shingles + md5) allocate a MessageDigest
  * and intermediate strings per shingle via interpreted higher-order
  * functions; these kernels reuse one thread-local digest and emit the
  * final representation directly. Each is spec'd bitwise-equal to the
  * composed form it replaces; the oracle SQL is unchanged.
  */
object TextKernelUtil {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  private def shingleBytes(toks: ArrayData, start: Int, n: Int): Array[Byte] = {
    // UTF-8 bytes of tokens[start..start+n) joined by ' '
    var len = n - 1
    var k = 0
    while (k < n) { len += toks.getUTF8String(start + k).numBytes(); k += 1 }
    val out = new Array[Byte](len)
    var pos = 0
    k = 0
    while (k < n) {
      val t = toks.getUTF8String(start + k)
      t.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
      pos += t.numBytes()
      if (k < n - 1) { out(pos) = ' '; pos += 1 }
      k += 1
    }
    out
  }

  /** 60-bit hash = first 15 hex digits of md5 (== conv(substr(md5hex,1,15),16,10)). */
  private def hash60(digest: Array[Byte]): Long = {
    // 15 hex digits = 7.5 bytes: bytes 0..6 full + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  /** Sorted distinct 60-bit hashes of word n-shingles. */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = mdLocal.get()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      hs(i) = hash60(md.digest(shingleBytes(toks, i, n)))
      i += 1
    }
    Arrays.sort(hs)
    // dedupe in place
    var w = 1
    var r = 1
    while (r < m) {
      if (hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(Arrays.copyOf(hs, w))
  }

  /** Min md5 hex string over n-shingles of md5(seed ++ shingle); byte-wise
    * min of the 32-char hex == lexicographic min of the hex strings. */
  def minhashHex(toks: ArrayData, n: Int, seedPrefix: Array[Byte]): UTF8String = {
    val m = toks.numElements() - n + 1
    if (m <= 0) return null
    val md = mdLocal.get()
    var best: Array[Byte] = null
    var i = 0
    while (i < m) {
      md.reset()
      md.update(seedPrefix)
      val d = md.digest(shingleBytes(toks, i, n))
      if (best == null || compareDigest(d, best) < 0) best = d
      i += 1
    }
    // hex encode
    val hex = new Array[Byte](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = HEX((best(k) & 0xf0) >> 4).toByte
      hex(2 * k + 1) = HEX(best(k) & 0x0f).toByte
      k += 1
    }
    UTF8String.fromBytes(hex)
  }

  // hex-string comparison == unsigned byte comparison of the digest
  private def compareDigest(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x - y
      i += 1
    }
    0
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * — the MOSS algorithm; public). One O(n) pass over the string's code
    * points:
    *
    *  1. Karp–Rabin ROLLING hash of every character k-gram:
    *     h_i = (Σ_j cp[i+j]·B^(k-1-j)) mod M with B=257, M=1e9+7 — each
    *     step reuses the previous hash (subtract the outgoing char's
    *     B^(k-1) term, multiply, add the incoming char) instead of
    *     rehashing k chars;
    *  2. winnowing: the MINIMUM hash of every window of w consecutive
    *     k-gram hashes is selected (monotonic-deque sliding minimum, O(n)
    *     total); fewer than w hashes → one clamped window;
    *  3. the DISTINCT selected values, sorted, are the fingerprint set.
    *
    * Guarantee (the paper's): any substring match of length ≥ k+w-1 shares
    * at least one fingerprint; no match shorter than k is detected. The
    * value set equals { min(window) : window } — position bookkeeping
    * (Schleimer's rightmost-tie rule) affects which POSITION is recorded,
    * never which VALUE, so a SQL oracle can re-derive the set with plain
    * per-window minima. */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    // code points, not UTF-16 units: supplementary chars must hash as one
    // symbol (and as the same symbol the oracle's code-point walk sees)
    val n = s.codePointCount(0, s.length)
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var ci = 0; var si = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp; ci += 1; si += Character.charCount(cp)
    }
    val M = 1000000007L
    val B = 257L
    // B^(k-1) mod M — the outgoing character's positional weight
    var bk = 1L
    var e = 0
    while (e < k - 1) { bk = bk * B % M; e += 1 }
    val nH = n - k + 1
    val hs = new Array[Long](nH)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < nH) {
      // roll: drop cps(i-1), admit cps(i+k-1); + M·B keeps the lhs positive
      h = ((h - cps(i - 1) * bk % M + M) * B + cps(i + k - 1)) % M
      hs(i) = h
      i += 1
    }
    // sliding-window minimum over hs with window w (clamped to one window
    // when nH < w), monotonic deque of indices — O(nH)
    val nWin = math.max(nH - w + 1, 1)
    val minima = new Array[Long](nWin)
    val deque = new Array[Int](nH)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    i = 0
    while (i < nH) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      val winStart = i - w + 1
      if (winStart >= 0) {
        while (deque(head) < winStart) head += 1
        minima(winStart) = hs(deque(head))
      } else if (i == nH - 1) {
        minima(0) = hs(deque(head)) // nH < w: single clamped window
      }
      i += 1
    }
    Arrays.sort(minima)
    var wr = 1
    var rd = 1
    while (rd < nWin) {
      if (minima(rd) != minima(rd - 1)) { minima(wr) = minima(rd); wr += 1 }
      rd += 1
    }
    new GenericArrayData(Arrays.copyOf(minima, wr))
  }

  /** Hyperplane LSH signature: bit p set iff Σ_d vec[d]*w[p][d] >= 0,
    * accumulated in index order (matches the expression-tree/SQL form). */
  def hyperplaneSig(vec: ArrayData, weights: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < weights.length) {
      val w = weights(p)
      var s = 0.0
      var d = 0
      while (d < w.length) { s += vec.getFloat(d).toDouble * w(d); d += 1 }
      if (s >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}

case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextKernelUtil.shingleHashes(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernelUtil.shingleHashes($a, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(child = c)
}

case class MinHashHexExpr(child: Expression, n: Int, seed: Int) extends UnaryExpression {
  private lazy val prefix = s"$seed:".getBytes("UTF-8")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    TextKernelUtil.minhashHex(a.asInstanceOf[ArrayData], n, prefix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("prefix", prefix, "byte[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.TextKernelUtil.minhashHex($a, $n, $pref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(c: Expression): MinHashHexExpr = copy(child = c)
}

case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow k ($k) and w ($w) must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextKernelUtil.winnowFingerprints(a.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernelUtil.winnowFingerprints($a, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprintsExpr =
    copy(child = c)
}

case class HyperplaneSigExpr(child: Expression, planes: Int, dims: Int)
    extends UnaryExpression {
  private lazy val weights: Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => Vectors.planeWeight(p, d).toDouble)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    TextKernelUtil.hyperplaneSig(a.asInstanceOf[ArrayData], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernelUtil.hyperplaneSig($a, $w)")
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneSigExpr = copy(child = c)
}

object TextKernels {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Sorted distinct 60-bit md5 shingle hashes of a token array. */
  def shingleHashes(toks: Column, n: Int): Column =
    column(ShingleHashesExpr(expression(toks), n))

  /** Min-wise md5-hex minhash of word n-shingles under `seed`. */
  def minhashHex(toks: Column, n: Int, seed: Int): Column =
    column(MinHashHexExpr(expression(toks), n, seed))

  /** Deterministic hyperplane LSH signature of an array<float> vector. */
  def hyperplaneSig(vec: Column, planes: Int, dims: Int): Column =
    column(HyperplaneSigExpr(expression(vec), planes, dims))

  /** Sorted distinct winnowing fingerprints (Karp–Rabin k-grams, window w)
    * of a string column. Pass NORMALIZED text (Text.normalize) so both
    * engines fingerprint the identical character stream. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    column(WinnowFingerprintsExpr(expression(text), k, w))
}
