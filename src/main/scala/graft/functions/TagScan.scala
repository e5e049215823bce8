package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `detectTags` (FromScrappyDump.kt:87–97): on the text before the
  * first `//@`, all `(@\S+)[:\s]*` handles then all `(#.+?#)` topics, in
  * match order — the fused byte-scan replacement for the two
  * regexp_extract_all walks that decoded the string and allocated a
  * Matcher per blog row in the triple-emission hot path. Java-regex
  * semantics replicated exactly:
  *  - `\S` is ASCII-only ([^ \t\n\x0B\f\r]) without UNICODE flags, so a
  *    byte-wise non-whitespace run is faithful (multi-byte UTF-8 units are
  *    all ≥ 0x80, never ASCII whitespace);
  *  - the handle's trailing `[:\s]*` is CONSUMED, moving where the next
  *    find() starts;
  *  - the topic's lazy `.+?` cannot cross the five line terminators;
  *  - findAll matches are non-overlapping, next attempt starts after the
  *    previous match end (or one past a failed start).
  * ExtractSpec pins this bit-identical to the regex formulation on golden
  * + fuzz vectors. */
object TagScan {

  private def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def isLineTerm(bs: Array[Byte], i: Int, end: Int): Boolean = {
    val b = bs(i)
    if (b == 0x0a || b == 0x0d) return true
    if (b == 0xc2.toByte && i + 1 < end && bs(i + 1) == 0x85.toByte)
      return true
    if (b == 0xe2.toByte && i + 2 < end && bs(i + 1) == 0x80.toByte &&
        (bs(i + 2) == 0xa8.toByte || bs(i + 2) == 0xa9.toByte)) return true
    false
  }

  def detect(u: UTF8String): ArrayData = {
    val bs = u.getBytes
    // cut at the first "//@" (substring_index(content, "//@", 1))
    var cut = bs.length
    var i = 0
    while (i + 2 < bs.length && cut == bs.length) {
      if (bs(i) == '/' && bs(i + 1) == '/' && bs(i + 2) == '@') cut = i
      i += 1
    }
    val out = new java.util.ArrayList[UTF8String](4)
    // pass 1: (@\S+)[:\s]* — greedy non-whitespace run after '@'
    var p = 0
    while (p < cut) {
      if (bs(p) == '@' && p + 1 < cut && !isAsciiWs(bs(p + 1))) {
        var q = p + 1
        while (q < cut && !isAsciiWs(bs(q))) q += 1
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bs, p, q)))
        // consume [:\s]* (':' is already inside \S so it only matters for
        // a colon FOLLOWING whitespace-terminated runs — java consumes
        // any mix of ':' and ASCII whitespace greedily)
        while (q < cut && (bs(q) == ':' || isAsciiWs(bs(q)))) q += 1
        p = q
      } else p += 1
    }
    // pass 2: (#.+?#) — lazy, '.' cannot cross a line terminator
    p = 0
    while (p < cut) {
      if (bs(p) == '#') {
        var q = p + 1
        var closed = -1
        var blocked = false
        while (q < cut && closed < 0 && !blocked) {
          if (bs(q) == '#' && q > p + 1) closed = q
          else if (isLineTerm(bs, q, cut)) blocked = true
          else q += 1
        }
        if (closed > 0) {
          out.add(UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bs, p, closed + 1)))
          p = closed + 1
        } else p += 1
      } else p += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class DetectTags(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "detect_tags"

  override protected def nullSafeEval(input: Any): Any =
    TagScan.detect(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TagScan.detect($c)")

  override protected def withNewChildInternal(newChild: Expression): DetectTags =
    copy(child = newChild)
}

object DetectTagsExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(DetectTags(ColumnBridge.expression(c)))
}
