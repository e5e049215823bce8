package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking: tokenize (WsSplit — the same native
  * tokenizer as TextStats.tokens), cut BEFORE any boundary token
  * (first 4 md5 bytes as an unsigned 32-bit value ≡ 0 mod avgWords —
  * exactly `conv(substring(md5(w),1,8),16,10) % avgWords = 0`) unless the
  * chunk is empty, and emit per chunk its md5 hex and token count. The
  * aggregate-HOF formulation it replaces ran INTERPRETED per row, with an
  * immutable array_append copy per chunk per token; this walk reuses one
  * thread-local digest and byte builder and allocates only the output
  * rows. Chunk text never leaves the expression — downstream sees
  * (h, n_words) only, the same hash-only exchange discipline. Parity is
  * pinned in DatapipeSpec against the HOF formulation. */
object CdcChunksFn {

  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val tlBuf = new ThreadLocal[java.io.ByteArrayOutputStream] {
    override def initialValue(): java.io.ByteArrayOutputStream =
      new java.io.ByteArrayOutputStream(256)
  }
  private final val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def chunks(u: UTF8String, avgWords: Int): ArrayData = {
    val md = tl.get()
    val buf = tlBuf.get()
    val toks = WsSplit.split(u)
    val n = toks.numElements()
    val out = new java.util.ArrayList[AnyRef](8)
    var started = false
    var nw = 0L
    def emit(): Unit = {
      md.reset()
      out.add(new GenericInternalRow(
        Array[Any](hex(md.digest(buf.toByteArray)), nw)))
    }
    var i = 0
    while (i < n) {
      val wb = toks.getUTF8String(i).getBytes
      md.reset()
      val dg = md.digest(wb)
      // first 8 hex chars of md5(w) as an unsigned 32-bit value
      val v = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
      if (v % avgWords == 0 && started) {
        emit(); started = false
      }
      if (!started) { started = true; buf.reset(); nw = 0L }
      else buf.write(' ')
      buf.write(wb, 0, wb.length)
      nw += 1
      i += 1
    }
    if (started) emit()
    buf.reset()
    new GenericArrayData(out.toArray)
  }
}

case class CdcChunks(child: Expression, avgWords: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", StringType, nullable = false),
      StructField("n_words", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunksFn.chunks(input.asInstanceOf[UTF8String], avgWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunksFn.chunks($c, $avgWords)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunksExpr {
  def apply(c: Column, avgWords: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(c), avgWords))
}
