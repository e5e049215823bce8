package graft.plans

import graft.functions.{DecodeMid, EncodeMid}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer — registers the engine's native
  * Catalyst expressions in the session FunctionRegistry, so SQL users get
  * `encode_mid` / `decode_mid` as codegen'd built-ins (not UDFs):
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *   SELECT encode_mid(mid_decimal) FROM blogs
  *
  * This is the (c)-level extension seam of SURVEY.md §7.5's preference
  * ladder (builtin > native Expression > UDF); the DataFrame surface
  * reaches the same expressions through functions/Base62.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[EncodeMid].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("encode_mid"),
      info("encode_mid", "encode_mid(decimal_mid) - weibo base62 mid codec (MicroBlog.kt:67-71)"),
      (args: Seq[Expression]) => EncodeMid(args.head)))
    ext.injectFunction((FunctionIdentifier("decode_mid"),
      info("decode_mid", "decode_mid(coded_mid) - weibo base62 mid codec (MicroBlog.kt:51-56)"),
      (args: Seq[Expression]) => DecodeMid(args.head)))
  }
}
