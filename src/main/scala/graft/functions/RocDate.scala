package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType}
import org.apache.spark.unsafe.types.UTF8String

/** E2+E3 as one codegen'd Catalyst expression (SURVEY §7.3): ROC-calendar
  * digit string → days-since-epoch DATE, NULL on anything invalid.
  *
  * Identical accept/reject set to the composed form
  * `to_date(concat_ws('-', year+1911, mm, dd), 'yyyy-M-d')` over 6/7-digit
  * inputs: strict month 1-12, strict day vs true month length (leap-aware).
  * One pass over the bytes, no formatter, no intermediate strings.
  */
object RocDateUtil {
  private def isLeap(y: Int): Boolean =
    (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  private def monthLen(y: Int, m: Int): Int = m match {
    case 2 => if (isLeap(y)) 29 else 28
    case 4 | 6 | 9 | 11 => 30
    case _ => 31
  }

  /** days since 1970-01-01 for a proleptic-Gregorian y/m/d */
  private def toEpochDay(y: Int, m: Int, d: Int): Int = {
    // standard civil-from-days inverse (Howard Hinnant's algorithm)
    val yy = if (m <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val mp = (m + 9) % 12
    val doy = (153 * mp + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097 + doe - 719468
  }

  /** Boxed Integer so null can signal invalid input. */
  def rocToEpochDay(s: UTF8String): Integer = {
    if (s == null) return null
    val n = s.numBytes()
    if (n < 6 || n > 7) return null
    val b = new Array[Int](n)
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      if (c < '0' || c > '9') return null
      b(i) = c - '0'
      i += 1
    }
    val yDigits = n - 4
    var rocYear = 0
    i = 0
    while (i < yDigits) { rocYear = rocYear * 10 + b(i); i += 1 }
    val y = rocYear + 1911
    val m = b(yDigits) * 10 + b(yDigits + 1)
    val d = b(yDigits + 2) * 10 + b(yDigits + 3)
    if (m < 1 || m > 12) return null
    if (d < 1 || d > monthLen(y, m)) return null
    Integer.valueOf(toEpochDay(y, m, d))
  }
}

case class RocDate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DateType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    RocDateUtil.rocToEpochDay(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("epochDay")
      s"""
        Integer $boxed = graft.functions.RocDateUtil.rocToEpochDay($a);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.intValue(); }
      """
    })

  override protected def withNewChildInternal(c: Expression): RocDate =
    copy(child = c)
}

object RocDate {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def rocDate(c: Column): Column = column(RocDate(expression(c)))
}
