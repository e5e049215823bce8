package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the base62 mid codec — the engine's one
  * scalar that built-ins can't express (custom radix table + segment
  * layout, MicroBlog.kt:8–43). A Scala UDF here would box every row and
  * fence whole-stage codegen; these expressions generate a direct static
  * call on UTF8String, so the codec stays inside the codegen span
  * (preference order SURVEY.md §7.5: builtin > native Expression > UDF).
  */
abstract class Base62Codec extends UnaryExpression {
  // input is always an internal string column (Normalize call sites)
  override def dataType: DataType = child.dataType // preserves collation
  override def nullIntolerant: Boolean = true
  protected def fn: String

  override protected def nullSafeEval(input: Any): Any =
    if (fn == "encodeMidUTF8") Base62.encodeMidUTF8(input.asInstanceOf[UTF8String])
    else Base62.decodeMidUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Base62.$fn($c)")
}

case class EncodeMid(child: Expression) extends Base62Codec {
  override protected def fn: String = "encodeMidUTF8"
  override def prettyName: String = "encode_mid"
  override protected def withNewChildInternal(newChild: Expression): EncodeMid =
    copy(child = newChild)
}

case class DecodeMid(child: Expression) extends Base62Codec {
  override protected def fn: String = "decodeMidUTF8"
  override def prettyName: String = "decode_mid"
  override protected def withNewChildInternal(newChild: Expression): DecodeMid =
    copy(child = newChild)
}

object Base62Expr {
  def encodeMid(c: Column): Column =
    ColumnBridge.column(EncodeMid(ColumnBridge.expression(c)))
  def decodeMid(c: Column): Column =
    ColumnBridge.column(DecodeMid(ColumnBridge.expression(c)))
}
