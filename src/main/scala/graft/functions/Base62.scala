package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** F8 — the weibo custom-radix (base-62, digits-then-lower-then-upper) mid
  * codec. Reference: weibo/MicroBlog.kt:8–40 (radix table + from/toCustomBase),
  * :51–56 (url2mid), :67–71 (encodeMid segment ranges), :73 (decodeMid).
  *
  * The only UDF family in the engine (SURVEY.md §7.5); pure + deterministic,
  * so Catalyst can still constant-fold/reorder around it. Everything else is
  * built-in column expressions.
  */
object Base62 {
  private val table = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val radix = 62L
  // MicroBlog.kt:10–11 — decimal mid digit ranges ↔ coded segment ranges.
  private val decimalRanges = Seq(0 to 1, 2 to 8, 9 to 15)
  private val codedRanges = Seq(0 to 0, 1 to 4, 5 to 8)

  /** base62 string → decimal string (MicroBlog.kt:22–30). */
  def fromCustomBase(s: String): String = {
    var v = 0L
    s.foreach { c => v = v * radix + table.indexOf(c) }
    v.toString
  }

  /** decimal string → base62 string, no padding (MicroBlog.kt:32–43). */
  def toCustomBase(s: String): String = {
    var v = s.toLong
    val sb = new StringBuilder
    while (v > 0) { sb.insert(0, table(((v % radix)).toInt)); v /= radix }
    sb.toString
  }

  /** 16-digit decimal mid → 9-char coded mid (MicroBlog.kt:67–71). */
  def encodeMid(decimal: String): String =
    decimalRanges.map(r => toCustomBase(decimal.substring(r.head, r.last + 1))).mkString

  /** 9-char coded mid → decimal mid string (MicroBlog.kt:51–56 semantics). */
  def decodeCodedMid(coded: String): String =
    codedRanges.map(r => fromCustomBase(coded.substring(r.head, r.last + 1))).mkString

  // UTF8String entry points — called from the generated code of the native
  // EncodeMid/DecodeMid expressions (Base62Expr.scala), so the codec runs
  // inside the whole-stage-codegen span with no row boxing.
  def encodeMidUTF8(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(encodeMid(s.toString))
  def decodeMidUTF8(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(decodeCodedMid(s.toString))

  val encodeMidUdf = udf((s: String) => if (s == null) null else encodeMid(s))
  val decodeMidUdf = udf((s: String) => if (s == null) null else decodeCodedMid(s))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("encode_mid", encodeMidUdf)
    spark.udf.register("decode_mid", decodeMidUdf)
  }

  /** Native-expression column surfaces (UDF forms kept only for SQL
    * registration parity). */
  def encode_mid(c: Column): Column = Base62Expr.encodeMid(c)
  def decode_mid(c: Column): Column = Base62Expr.decodeMid(c)
}
