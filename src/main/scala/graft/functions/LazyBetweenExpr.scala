package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `regexp_extract(c, "<prefix>(.+?)<suffix>", 1)` for LITERAL
  * prefix/suffix — the shape of the three HTML pulls on the normalize hot
  * path (title="(.+?)", nick-name="(.+?)" , >(.+?)</). Byte scan with
  * find() semantics: prefix occurrences tried in order; the lazy group
  * (≥ 1 char, '.' cannot cross the five line terminators) ends at the
  * EARLIEST suffix; "" on no match. Parity-pinned in ExtractSpec. */
object LazyBetween {

  private def isLineTerm(bs: Array[Byte], i: Int): Boolean = {
    val b = bs(i)
    if (b == 0x0a || b == 0x0d) return true
    if (b == 0xc2.toByte && i + 1 < bs.length && bs(i + 1) == 0x85.toByte)
      return true
    if (b == 0xe2.toByte && i + 2 < bs.length && bs(i + 1) == 0x80.toByte &&
        (bs(i + 2) == 0xa8.toByte || bs(i + 2) == 0xa9.toByte)) return true
    false
  }

  private def startsAt(bs: Array[Byte], i: Int, lit: Array[Byte]): Boolean = {
    if (i + lit.length > bs.length) return false
    var k = 0
    while (k < lit.length && bs(i + k) == lit(k)) k += 1
    k == lit.length
  }

  private final val EMPTY = UTF8String.fromString("")

  def extract(u: UTF8String, prefix: Array[Byte],
              suffix: Array[Byte]): UTF8String = {
    val bs = u.getBytes
    var s = 0
    while (s + prefix.length <= bs.length) {
      if (startsAt(bs, s, prefix)) {
        val e = s + prefix.length
        var p = e + 1 // lazy group needs ≥ 1 char before the suffix
        var blocked = e >= bs.length || isLineTerm(bs, e)
        while (p < bs.length && !blocked) {
          if (startsAt(bs, p, suffix))
            return UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(bs, e, p))
          if (isLineTerm(bs, p)) blocked = true else p += 1
        }
      }
      s += 1
    }
    EMPTY
  }
}

case class LazyBetweenExtract(child: Expression, prefix: String,
                              suffix: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lazy_between"

  private lazy val pre = prefix.getBytes("UTF-8")
  private lazy val suf = suffix.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    LazyBetween.extract(input.asInstanceOf[UTF8String], pre, suf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val preRef = ctx.addReferenceObj("lbPre", pre, "byte[]")
    val sufRef = ctx.addReferenceObj("lbSuf", suf, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LazyBetween.extract($c, $preRef, $sufRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LazyBetweenExtract =
    copy(child = newChild)
}

object LazyBetweenExpr {
  def apply(c: Column, prefix: String, suffix: String): Column =
    ColumnBridge.column(LazyBetweenExtract(ColumnBridge.expression(c),
      prefix, suffix))
}
