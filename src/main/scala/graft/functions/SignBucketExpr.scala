package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, DoubleArrayInputs}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native random-hyperplane sign bucket over an array<double> column.
  *
  * The HOF formulation — `aggregate(zip_with(v, sequence, ...))` once per
  * plane — is interpreted (CodegenFallback, per-element lambda dispatch and
  * array allocation, planes × dims md5 calls PER ROW) and runs once per
  * CORPUS row in every ANN / embedding-near-dup query; the same shape
  * measured 11× CPU inflation at 8 concurrent cores for SpanFields. This
  * expression precomputes the md5-derived ±1 sign table ONCE per (planes,
  * dims) and evaluates each row as one fused primitive loop over
  * planes × dims, inside the whole-stage-codegen span.
  *
  * The sign rule is BIT-IDENTICAL to the column formulation the DuckDB
  * oracles mirror: sign(p, d) = +1 iff the first 6 hex chars of
  * md5("p_d"), read base-16, are even — i.e. the low bit of the md5
  * digest's third byte is 0. Dot accumulation is left-to-right, matching
  * the HOF fold (parity-tested in DatapipeSpec). */
case class SignBucket(child: Expression, planes: Int)
    extends UnaryExpression with DoubleArrayInputs {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_bucket"
  // float/decimal arrays cast at analysis time, not a runtime CCE
  override protected def nVectorArgs: Int = 1

  // (dims, flattened signs[p * dims + d]) — built on first eval, when the
  // vector width is observed; volatile publish so concurrent tasks sharing
  // the deserialized expression see a fully-built table
  @transient @volatile private var table: (Int, Array[Double]) = null

  private def signTable(dims: Int): (Int, Array[Double]) = {
    val t = table
    if (t != null && t._1 >= dims) t
    else synchronized {
      val t2 = table
      if (t2 != null && t2._1 >= dims) t2
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val s = new Array[Double](planes * dims)
        var p = 0
        while (p < planes) {
          var d = 0
          while (d < dims) {
            md.reset()
            val digest = md.digest(s"${p}_$d".getBytes("UTF-8"))
            // first 6 hex chars base-16 = first 3 digest bytes as a 24-bit
            // unsigned int; parity = low bit of byte 2
            s(p * dims + d) = if ((digest(2) & 1) == 0) 1.0 else -1.0
            d += 1
          }
          p += 1
        }
        val built = (dims, s)
        table = built
        built
      }
    }
  }

  /** One row: planes dot products over the precomputed sign table. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    // HOF parity: an EMPTY vector zip_withs against sequence(0, -1) = [0,-1],
    // padding with null elements — the dot null-propagates and
    // when(dot >= 0).otherwise(0) yields bucket 0, NOT the all-ones bucket a
    // skipped dims loop (dot = 0.0 >= 0 per plane) would produce
    if (n == 0) return 0L
    // same propagation for a null ELEMENT inside a non-empty vector
    var c = 0
    while (c < n) {
      if (arr.isNullAt(c)) return 0L
      c += 1
    }
    val (dims, signs) = signTable(n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val base = p * dims
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += arr.getDouble(d) * signs(base + d)
        d += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBucket", this,
      classOf[SignBucket].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignBucket =
    copy(child = newChild)
}

object SignBucket {
  def apply(v: Column, planes: Int): Column =
    ColumnBridge.column(SignBucket(ColumnBridge.expression(v), planes))
}
