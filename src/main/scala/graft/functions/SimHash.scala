package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass SimHash over a token array: ONE md5 per token (the
  * composed-expression formulation recomputes md5 once per BIT), bit votes
  * extracted straight from the digest bytes. Width-parameterized up to 64
  * bits (the first 16 hex digits of the md5).
  *
  * Value contract: identical to the oracle formulation
  *   bit(b) = (hexdigit(md5hex(token), b/4) >> (b%4)) & 1, vote ±1 per
  *   token (with multiplicity), result bit b set iff vote > 0 —
  * hex digit b/4 is the high/low nibble of digest byte b/8. The rule is
  * prefix-stable: bits 0..31 of the 64-bit fingerprint ARE the 32-bit
  * fingerprint (`simhash(t, 64) & 0xFFFFFFFF == simhash(t, 32)`), so
  * widening never changes downstream 32-bit consumers.
  *
  * Why width matters at scale: LSH banding over a w-bit fingerprint with
  * `bands` bands gives 2^(w/bands) distinct keys per band. 32 bits / 4
  * bands = 8-bit keys = 256 buckets → bucket sizes O(n/256) and candidate
  * pairs O(n²/256) — quadratic at 100 TB. 64 bits / 4 bands = 16-bit keys
  * = 65,536 buckets per band, collapsing candidates to true near-dups.
  */
object SimHashUtil {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def simhash(toks: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      val token = toks.getUTF8String(t)
      val digest = md.get()
      digest.reset()
      val d = digest.digest(token.getBytes)
      var b = 0
      while (b < bits) {
        // hex char index b/4: even → high nibble of byte b/8, odd → low
        val byte = d(b / 8) & 0xff
        val digit = if ((b / 4) % 2 == 0) byte >> 4 else byte & 0xf
        votes(b) += (((digit >> (b % 4)) & 1) * 2) - 1
        b += 1
      }
      t += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  def simhash32(toks: ArrayData): Long = simhash(toks, 32)

  // referenced from generated code
  def simhashJ(toks: ArrayData, bits: Int): Long = simhash(toks, bits)
}

case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"simhash width must be 1..64, got $bits")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    SimHashUtil.simhash(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SimHashUtil.simhashJ($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHash {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** `bits`-wide simhash of a token array column (1..64). */
  def simhash(toks: Column, bits: Int): Column =
    column(SimHashExpr(expression(toks), bits))

  /** 32-bit simhash of a token array column. */
  def simhash32(toks: Column): Column = simhash(toks, 32)

  /** 64-bit simhash of a token array column. */
  def simhash64(toks: Column): Column = simhash(toks, 64)
}
