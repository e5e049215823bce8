package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-chunk character histogram: one walk over a (≤ chunk-sized) string
  * → array<struct<ch: string, n: long>> of its distinct characters with
  * counts. Replaces the per-CHARACTER explode in TextStats.charEntropy
  * (one Generate row per char of the corpus) with one row per DISTINCT
  * char per chunk — the (id, ch) aggregate downstream sees ~40× fewer
  * rows at natural-text alphabet sizes, and the per-row map stays bounded
  * by the caller's chunk size (the OOM invariant the chunked walk exists
  * for). Characters are code points, exactly like the substr(i, 1) walk
  * it replaces. Insertion order = first occurrence (deterministic). */
object CharCountsFn {
  def counts(u: UTF8String): ArrayData = {
    val bs = u.getBytes
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](64)
    var i = 0
    while (i < bs.length) {
      // lead-byte char width, exactly the code-point walk substr(i, 1) did
      val w = math.min(UTF8String.numBytesForFirstByte(bs(i)),
        bs.length - i)
      val ch = UTF8String.fromBytes(bs, i, w)
      val slot = m.get(ch)
      if (slot == null) m.put(ch, Array(1L)) else slot(0) += 1
      i += w
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class CharCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ch", StringType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_counts"

  override protected def nullSafeEval(input: Any): Any =
    CharCountsFn.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharCountsFn.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCountsExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(CharCounts(ColumnBridge.expression(c)))
}
