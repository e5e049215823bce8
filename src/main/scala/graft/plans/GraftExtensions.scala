package graft.plans

import graft.functions.{CosineSim, DecodeMid, EncodeMid, SignBucket, SpanFields, TextCounts}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions installer — registers the engine's native
  * Catalyst expressions in the session FunctionRegistry, so SQL users get
  * them as codegen'd built-ins (not UDFs):
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *   SELECT encode_mid(mid_decimal) FROM blogs
  *   SELECT cosine_sim(a.v, b.v), sign_bucket(v, 8) FROM embs ...
  *
  * This is the (c)-level extension seam of SURVEY.md §7.5's preference
  * ladder (builtin > native Expression > UDF); the DataFrame surface
  * reaches the same expressions through functions/Base62, Dedup.cosine
  * and Similarity.signBucket.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(cls: Class[_], name: String, usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage, "")

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("encode_mid"),
      info(classOf[EncodeMid], "encode_mid", "encode_mid(decimal_mid) - weibo base62 mid codec (MicroBlog.kt:67-71)"),
      (args: Seq[Expression]) => { arity("encode_mid", 1, args); EncodeMid(args.head) }))
    ext.injectFunction((FunctionIdentifier("decode_mid"),
      info(classOf[DecodeMid], "decode_mid", "decode_mid(coded_mid) - weibo base62 mid codec (MicroBlog.kt:51-56)"),
      (args: Seq[Expression]) => { arity("decode_mid", 1, args); DecodeMid(args.head) }))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSim], "cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>, one fused primitive loop"),
      (args: Seq[Expression]) => { arity("cosine_sim", 2, args); CosineSim(args(0), args(1)) }))
    ext.injectFunction((FunctionIdentifier("sign_bucket"),
      info(classOf[SignBucket], "sign_bucket", "sign_bucket(v, planes) - deterministic random-hyperplane LSH bucket of array<double>; planes must be a literal int"),
      (args: Seq[Expression]) => {
        arity("sign_bucket", 2, args)
        args(1) match {
          case Literal(p: Int, _) => SignBucket(args(0), p)
          case other => throw new IllegalArgumentException(
            s"sign_bucket: planes must be an integer literal, got $other")
        }
      }))
    ext.injectFunction((FunctionIdentifier("text_counts"),
      info(classOf[TextCounts], "text_counts", "text_counts(text) - all 8 per-doc scalar counters (char/token/distinct/subword/stopword/cjk/punct/symbol) in ONE fused text walk; read fields off the returned struct"),
      (args: Seq[Expression]) => { arity("text_counts", 1, args); TextCounts(args.head) }))
    ext.injectFunction((FunctionIdentifier("span_fields"),
      info(classOf[SpanFields], "span_fields", "span_fields(spans) - first-per-kind span fields + stat counters of an interleaved span array in ONE walk; read fields off the returned struct"),
      (args: Seq[Expression]) => { arity("span_fields", 1, args); SpanFields(args.head) }))
  }
}
