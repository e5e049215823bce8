package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `split(trim(text), "\s+")` — the whitespace tokenizer under
  * every shingle/minhash/LM/chunk operator. The regex form pays a Matcher
  * walk per row on every corpus scan; this is one byte scan with the
  * exact same semantics:
  *  - trim strips leading/trailing 0x20 SPACES only (Spark's trim);
  *  - java \s is ASCII-only: [ \t\n\x0B\f\r] — byte-safe on UTF-8;
  *  - split limit −1: a leading separator run yields one leading empty
  *    token, a trailing run one trailing empty token, and "" yields [""].
  * ExtractSpec pins it bit-identical to the regex formulation on fuzz
  * vectors. */
object WsSplit {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def split(u: UTF8String): ArrayData = {
    val bs0 = u.getBytes
    // trim: 0x20 only, both ends
    var lo = 0
    var hi = bs0.length
    while (lo < hi && bs0(lo) == ' ') lo += 1
    while (hi > lo && bs0(hi - 1) == ' ') hi -= 1
    if (lo == hi) // empty after trim → [""]
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val out = new java.util.ArrayList[UTF8String](16)
    var i = lo
    var tokStart = lo
    if (isWs(bs0(lo))) { // leading separator run → leading empty token
      out.add(UTF8String.EMPTY_UTF8)
      while (i < hi && isWs(bs0(i))) i += 1
      tokStart = i
    }
    while (i < hi) {
      if (isWs(bs0(i))) {
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bs0, tokStart, i)))
        while (i < hi && isWs(bs0(i))) i += 1
        tokStart = i
      } else i += 1
    }
    // token (or trailing empty, when the string ended in a separator run)
    out.add(UTF8String.fromBytes(
      java.util.Arrays.copyOfRange(bs0, tokStart, hi)))
    new GenericArrayData(out.toArray)
  }
}

case class WsSplitTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_split_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WsSplit.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsSplit.split($c)")

  override protected def withNewChildInternal(newChild: Expression): WsSplitTokens =
    copy(child = newChild)
}

object WsSplitExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(WsSplitTokens(ColumnBridge.expression(c)))
}
