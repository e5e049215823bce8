package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd `∃ span: span.kind == kind` over an interleaved span array —
  * the doc-classification predicate (blog vs comment) that gates BOTH
  * normalize streams, evaluated on EVERY corpus row. The `exists(spans,
  * s -> s.kind == 'cid')` higher-order formulation it replaces is
  * interpreted: one lambda dispatch + variable bind per ELEMENT per row —
  * pure allocation bandwidth in the fused map stage's hottest filter.
  * Null elements / null kinds are skipped (the corpus never produces
  * them; SpanFields skips them identically). Early exit on first hit. */
case class HasSpanKind(child: Expression, kind: String)
    extends UnaryExpression {

  override def prettyName: String = "has_span_kind"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val iKind = elemType.fieldIndex("kind")
  private lazy val nFields = elemType.length
  private lazy val target = UTF8String.fromString(kind)

  override protected def nullSafeEval(input: Any): Any =
    HasSpanKind.hasKind(input.asInstanceOf[ArrayData], iKind, nFields, target)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val targetRef = ctx.addReferenceObj("kindU", target,
      classOf[UTF8String].getName)
    // NOTE: the helper must NOT be named `eval` — the case class inherits
    // Expression.eval(InternalRow), which suppresses the companion's static
    // forwarder, and Janino then resolves the call to the instance method
    // and fails (silent interpreted fallback for the whole projection).
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HasSpanKind.hasKind($c, $iKind, $nFields, $targetRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HasSpanKind =
    copy(child = newChild)
}

object HasSpanKind {
  def hasKind(arr: ArrayData, iKind: Int, nFields: Int,
              target: UTF8String): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, nFields)
        if (!row.isNullAt(iKind) && row.getUTF8String(iKind).equals(target))
          return true
      }
      i += 1
    }
    false
  }

  def apply(c: Column, kind: String): Column =
    ColumnBridge.column(HasSpanKind(ColumnBridge.expression(c), kind))
}

/** One-pass span-field extraction: spans array → flat struct of the
  * min-offset span per kind (+ prefix-matched stat counters + the
  * comment marker).
  *
  * The higher-order formulation — `get(filter(spans, s -> s.kind == k), 0)`
  * per field — is interpreted (HOFs are CodegenFallback) and re-walks the
  * spans array once per FIELD: ~15 lambda-dispatching, array-allocating
  * passes per row. Measured: materializing every normalized blog column
  * that way costs 24 s CPU at 2 threads but 275 s at 8 — the allocation
  * storm collapses under concurrent cores (the regime a real executor
  * runs in). This expression walks the array once per ROW with zero
  * per-element allocation and hands every downstream column a plain
  * (codegen'd) struct-field read.
  *
  * "First span of a kind" is defined as MIN OFFSET (the reference parses
  * fields in document order — FromScrappyDump.kt:162–285), so no separate
  * array_sort pass is needed.
  */
case class SpanFields(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import SpanFields._

  override def prettyName: String = "span_fields"
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = schema

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val iKind = elemType.fieldIndex("kind")
  private lazy val iText = elemType.fieldIndex("text")
  private lazy val iRef = elemType.fieldIndex("media_ref")
  private lazy val iOff = elemType.fieldIndex("offset")
  private lazy val nFields = elemType.length

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // per-kind best (min-offset) text/ref; stats tracked per prefix.
    // Scratch is PER-THREAD and reset per call — six fresh arrays per row
    // was measurable allocation bandwidth on the corpus-wide normalize
    // pass (the host-shared resource the 4N-executor side contends for).
    val scratch = SpanFields.tlScratch.get()
    scratch.reset()
    val off = scratch.off
    // null offsets order LAST (sentinel MaxValue-1) but must SURFACE as
    // null, not the sentinel — tracked separately from the ordering value
    val offNull = scratch.offNull
    val text = scratch.text
    val ref = scratch.ref
    val statOff = scratch.statOff
    val stat = scratch.stat
    var isComment = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, nFields)
        val kind = if (row.isNullAt(iKind)) null else row.getUTF8String(iKind)
        if (kind != null) {
          val o = if (row.isNullAt(iOff)) Int.MaxValue - 1 else row.getInt(iOff)
          if (kind.equals(KIND_CID)) isComment = true
          if (kind.equals(KIND_STAT)) {
            val t = if (row.isNullAt(iText)) null else row.getUTF8String(iText)
            if (t != null) {
              var p = 0
              while (p < statPrefixes.length) {
                if (o < statOff(p) && t.startsWith(statPrefixes(p))) {
                  statOff(p) = o; stat(p) = t
                }
                p += 1
              }
            }
          } else {
            var k = 0
            var found = false
            while (k < kinds.length && !found) {
              if (kind.equals(kinds(k))) {
                found = true
                if (o < off(k)) {
                  off(k) = o
                  offNull(k) = row.isNullAt(iOff)
                  text(k) = if (row.isNullAt(iText)) null else row.getUTF8String(iText)
                  ref(k) = if (row.isNullAt(iRef)) null else row.getUTF8String(iRef)
                }
              }
              k += 1
            }
          }
        }
      }
      i += 1
    }
    val out = new Array[Any](schema.length)
    var k = 0
    while (k < kinds.length) {
      out(3 * k) = text(k)
      out(3 * k + 1) = ref(k)
      out(3 * k + 2) =
        if (off(k) == Int.MaxValue || offNull(k)) null else Integer.valueOf(off(k))
      k += 1
    }
    var p = 0
    while (p < statPrefixes.length) {
      out(3 * kinds.length + p) = stat(p)
      p += 1
    }
    out(schema.length - 1) = java.lang.Boolean.valueOf(isComment)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanFields =
    copy(child = newChild)
}

object SpanFields {
  /** span kinds whose first (min-offset) occurrence is surfaced */
  private[functions] val kindNames =
    Seq("link", "text", "uname", "ctime", "time", "scrap", "src", "cid", "user")
  private[functions] val statPrefixNames = Seq("转发", "评论", "点赞", "赞")

  private val kinds = kindNames.map(UTF8String.fromString).toArray
  private val statPrefixes = statPrefixNames.map(UTF8String.fromString).toArray
  private val KIND_CID = UTF8String.fromString("cid")
  private val KIND_STAT = UTF8String.fromString("stat")

  val schema: StructType = StructType(
    kindNames.flatMap(k => Seq(
      StructField(s"${k}_text", StringType),
      StructField(s"${k}_ref", StringType),
      StructField(s"${k}_off", IntegerType))) ++
    statPrefixNames.zipWithIndex.map { case (_, i) =>
      StructField(s"stat_$i", StringType) } :+
    StructField("is_comment", BooleanType, nullable = false))

  /** stat field name for a counter prefix (转发/评论/点赞/赞). */
  def statField(prefix: String): String =
    s"stat_${statPrefixNames.indexOf(prefix)}"

  /** Reused per-thread walk state (results are COPIED into the output row
    * before the next call, so reuse is safe). */
  private[functions] final class Scratch {
    val off = new Array[Int](kindNames.length)
    val offNull = new Array[Boolean](kindNames.length)
    val text = new Array[UTF8String](kindNames.length)
    val ref = new Array[UTF8String](kindNames.length)
    val statOff = new Array[Int](statPrefixNames.length)
    val stat = new Array[UTF8String](statPrefixNames.length)
    def reset(): Unit = {
      java.util.Arrays.fill(off, Int.MaxValue)
      java.util.Arrays.fill(offNull, false)
      java.util.Arrays.fill(text.asInstanceOf[Array[AnyRef]], null)
      java.util.Arrays.fill(ref.asInstanceOf[Array[AnyRef]], null)
      java.util.Arrays.fill(statOff, Int.MaxValue)
      java.util.Arrays.fill(stat.asInstanceOf[Array[AnyRef]], null)
    }
  }

  private[functions] val tlScratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  def apply(c: Column): Column =
    ColumnBridge.column(SpanFields(ColumnBridge.expression(c)))
}
