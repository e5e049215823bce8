package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native parsers for the three URL/stat regexes on the normalize hot path
  * (MicroBlog.kt:4–7, FromScrappyDump.kt:38). Each java-regex evaluation
  * decodes the UTF8String to a java String and allocates a Matcher PER ROW
  * — together the URL/stat pulls were ~10% of the fused map stage's CPU
  * (leaf profile). These are byte-level scans with java.util.regex
  * semantics replicated EXACTLY (lazy groups, '.' excluding the five line
  * terminators, find() occurrence order); DatapipeSpec/ExtractSpec pin
  * them bit-identical to the regex formulations they replace.
  *
  * Byte-wise scanning is sound on UTF-8: ASCII literals ('/', digits,
  * letters) never appear inside a multi-byte sequence (continuation bytes
  * are ≥ 0x80), and the three non-ASCII line terminators are matched by
  * their leading-byte patterns (C2 85, E2 80 A8/A9).
  */
object UrlParse {

  private final val PREFIX = "//weibo.com/".getBytes("UTF-8") // all ASCII

  private def isAlnum(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Is a line-terminator CHARACTER ('.'-excluded in java regex) starting
    * at byte i? (\n, \r, U+0085, U+2028, U+2029) */
  private def isLineTerm(bs: Array[Byte], i: Int): Boolean = {
    val b = bs(i)
    if (b == 0x0a || b == 0x0d) return true
    if (b == 0xc2.toByte && i + 1 < bs.length && bs(i + 1) == 0x85.toByte)
      return true
    if (b == 0xe2.toByte && i + 2 < bs.length && bs(i + 1) == 0x80.toByte &&
        (bs(i + 2) == 0xa8.toByte || bs(i + 2) == 0xa9.toByte)) return true
    false
  }

  private def indexOfPrefix(bs: Array[Byte], from: Int): Int = {
    var s = from
    val last = bs.length - PREFIX.length
    while (s <= last) {
      var k = 0
      while (k < PREFIX.length && bs(s + k) == PREFIX(k)) k += 1
      if (k == PREFIX.length) return s
      s += 1
    }
    -1
  }

  /** `//weibo\.com/(.+?)/([A-Za-z0-9]{9}).*` via find(): returns the
    * (group1 start, group1 end/separator, i.e. mid start − 1) byte bounds,
    * or null when no match. */
  private def blogMatch(bs: Array[Byte]): Array[Int] = {
    var s = indexOfPrefix(bs, 0)
    while (s >= 0) {
      val e = s + PREFIX.length
      var p = e
      var aborted = false
      while (p < bs.length && !aborted) {
        if (isLineTerm(bs, p)) aborted = true
        else {
          if (bs(p) == '/' && p > e && p + 9 < bs.length + 0 && {
                // exactly 9 alnum bytes must follow the separator
                p + 10 <= bs.length && {
                  var k = p + 1
                  while (k <= p + 9 && isAlnum(bs(k))) k += 1
                  k == p + 10
                }
              }) return Array(e, p)
          p += 1
        }
      }
      s = indexOfPrefix(bs, s + 1)
    }
    null
  }

  private def slice(bs: Array[Byte], from: Int, until: Int): UTF8String =
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(bs, from, until))

  private final val EMPTY = UTF8String.fromString("")

  /** group 2 (the 9-char coded mid) or "" — regexp_extract's no-match. */
  def blogMid(u: UTF8String): UTF8String = {
    val bs = u.getBytes
    val m = blogMatch(bs)
    if (m == null) EMPTY else slice(bs, m(1) + 1, m(1) + 10)
  }

  /** group 1 (the uid path segment) or "". */
  def blogUid(u: UTF8String): UTF8String = {
    val bs = u.getBytes
    val m = blogMatch(bs)
    if (m == null) EMPTY else slice(bs, m(0), m(1))
  }

  /** `//weibo\.com/([A-Za-z0-9/]*)` group 1 with every "u/" removed
    * (uidFromUserUrl: regexp_extract + regexp_replace). The char class
    * includes '/', group may be empty; first prefix occurrence always
    * matches. */
  def userUid(u: UTF8String): UTF8String = {
    val bs = u.getBytes
    val s = indexOfPrefix(bs, 0)
    if (s < 0) return EMPTY
    val from = s + PREFIX.length
    var p = from
    while (p < bs.length && (isAlnum(bs(p)) || bs(p) == '/')) p += 1
    // remove non-overlapping "u/" left to right (regexp_replace semantics)
    val out = new Array[Byte](p - from)
    var i = from
    var o = 0
    while (i < p) {
      if (bs(i) == 'u' && i + 1 < p && bs(i + 1) == '/') i += 2
      else { out(o) = bs(i); o += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Anchored `^.*?([0-9]+)$` group 1 or null (firstMatch + nullif): the
    * maximal ASCII-digit suffix, valid only when the prefix before it
    * contains no line terminator ('.' cannot cross one). Java's `$` (no
    * MULTILINE) also matches just before ONE final line terminator
    * (\n, \r\n, \r, U+0085, U+2028, U+2029), so a trailing terminator is
    * skipped before the suffix scan. */
  def digitSuffix(u: UTF8String): UTF8String = {
    val bs = u.getBytes
    var end = bs.length
    if (end >= 2 && bs(end - 2) == 0x0d && bs(end - 1) == 0x0a) end -= 2
    else if (end >= 1 && (bs(end - 1) == 0x0a || bs(end - 1) == 0x0d)) end -= 1
    else if (end >= 2 && bs(end - 2) == 0xc2.toByte &&
             bs(end - 1) == 0x85.toByte) end -= 2
    else if (end >= 3 && bs(end - 3) == 0xe2.toByte &&
             bs(end - 2) == 0x80.toByte &&
             (bs(end - 1) == 0xa8.toByte || bs(end - 1) == 0xa9.toByte))
      end -= 3
    var s = end
    while (s > 0 && bs(s - 1) >= '0' && bs(s - 1) <= '9') s -= 1
    if (s == end) return null // no digit suffix → no match
    var i = 0
    while (i < s) {
      if (isLineTerm(bs, i)) return null // prefix can't cross a line term
      i += 1
    }
    slice(bs, s, end)
  }
}

abstract class UrlParseExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  protected def fn: String

  override protected def nullSafeEval(input: Any): Any = fn match {
    case "blogMid" => UrlParse.blogMid(input.asInstanceOf[UTF8String])
    case "blogUid" => UrlParse.blogUid(input.asInstanceOf[UTF8String])
    case "userUid" => UrlParse.userUid(input.asInstanceOf[UTF8String])
    case _ => UrlParse.digitSuffix(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlParse.$fn($c)")
}

case class BlogUrlMid(child: Expression) extends UrlParseExpr {
  override protected def fn: String = "blogMid"
  override def prettyName: String = "blog_url_mid"
  override protected def withNewChildInternal(newChild: Expression): BlogUrlMid =
    copy(child = newChild)
}

case class BlogUrlUid(child: Expression) extends UrlParseExpr {
  override protected def fn: String = "blogUid"
  override def prettyName: String = "blog_url_uid"
  override protected def withNewChildInternal(newChild: Expression): BlogUrlUid =
    copy(child = newChild)
}

case class UserUrlUid(child: Expression) extends UrlParseExpr {
  override protected def fn: String = "userUid"
  override def prettyName: String = "user_url_uid"
  override protected def withNewChildInternal(newChild: Expression): UserUrlUid =
    copy(child = newChild)
}

case class DigitSuffix(child: Expression) extends UrlParseExpr {
  override protected def fn: String = "digitSuffix"
  override def prettyName: String = "digit_suffix"
  override protected def withNewChildInternal(newChild: Expression): DigitSuffix =
    copy(child = newChild)
}

object UrlParseExpr {
  def blogMid(c: Column): Column =
    ColumnBridge.column(BlogUrlMid(ColumnBridge.expression(c)))
  def blogUid(c: Column): Column =
    ColumnBridge.column(BlogUrlUid(ColumnBridge.expression(c)))
  def userUid(c: Column): Column =
    ColumnBridge.column(UserUrlUid(ColumnBridge.expression(c)))
  def digitSuffix(c: Column): Column =
    ColumnBridge.column(DigitSuffix(ColumnBridge.expression(c)))
}
