package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 32-bit SimHash over a token array: ONE md5 per token (the
  * composed-expression formulation recomputes md5 once per BIT — 32×), bit
  * votes extracted straight from the digest bytes.
  *
  * Value contract: identical to the oracle formulation
  *   bit(b) = (hexdigit(md5hex(token), b/4) >> (b%4)) & 1, vote ±1 per
  *   token (with multiplicity), result bit b set iff vote > 0 —
  * hex digit b/4 is the high/low nibble of digest byte b/8.
  */
object SimHashUtil {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def simhash32(toks: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      val token = toks.getUTF8String(t)
      val digest = md.get()
      digest.reset()
      val d = digest.digest(token.getBytes)
      var b = 0
      while (b < 32) {
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
    while (b < 32) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  // referenced from generated code
  def simhash32J(toks: ArrayData): Long = simhash32(toks)
}

case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    SimHashUtil.simhash32(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SimHashUtil.simhash32($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** 32-bit simhash of a token array column. */
  def simhash32(toks: Column): Column = column(SimHash32(expression(toks)))
}
