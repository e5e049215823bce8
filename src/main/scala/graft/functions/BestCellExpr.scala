package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DoubleArrayInputs, VectorAndCentroidsInputs}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Shared scalar helpers for the IVF assignment expressions — each
  * replicates the exact semantics of the Catalyst operators it replaces so
  * the DuckDB oracles (and the pre-existing gate hashes) are unaffected. */
object BestCell {

  /** Spark's `round(x, 6)` for DoubleType: NaN/Inf pass through, otherwise
    * BigDecimal over `Double.toString` with HALF_UP — the same decimal
    * string path `RoundBase` takes (property-pinned vs `round()` in
    * DatapipeSpec). */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's nan-safe double ordering (`Utils.nanSafeCompareDoubles`): NaN
    * is greater than anything and equal to itself; otherwise
    * `java.lang.Double.compare` (so -0.0 < 0.0, as in SQL ORDER BY). */
  def cmp(a: Double, b: Double): Int = {
    val an = java.lang.Double.isNaN(a)
    val bn = java.lang.Double.isNaN(b)
    if (an && bn) 0
    else if (an) 1
    else if (bn) -1
    else java.lang.Double.compare(a, b)
  }

  def apply(v: Column, cents: Column): Column =
    ColumnBridge.column(BestCell(
      ColumnBridge.expression(v), ColumnBridge.expression(cents)))
}

/** Native nearest-centroid argmax: for a vector and a (small, plan-resident)
  * centroid table, returns struct(cid, csim) of the best cell — max
  * `round(cosine, 6)`, ties to the MIN cid, exactly the
  * `max_by(struct(...), struct(csim, -cid))` aggregate it replaces
  * (nan-safe ordering included). Turning the assignment into ONE fused
  * primitive loop per row removes the cross-join + two-phase aggregate
  * shape entirely: at lake scale the old plan exchanged one
  * (id, v, cid, csim) struct per corpus vector (the partial aggregate
  * absorbed the k-fold fan-out but the full vector still crossed the
  * wire); this is a pure projection — zero corpus-side Exchange.
  *
  * Null handling: null/absent centroid entries are skipped (they could
  * never win the old max_by either — a null csim sorts below every
  * non-null); an EMPTY centroid table yields null, which callers filter —
  * the old inner join against an empty side emitted nothing. */
case class BestCell(left: Expression, right: Expression)
    extends BinaryExpression with VectorAndCentroidsInputs {
  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "best_cell"

  def compute(v: ArrayData, cents: ArrayData): InternalRow = {
    val k = cents.numElements()
    var bestCid = 0L
    var bestSim = 0.0
    var has = false
    var i = 0
    while (i < k) {
      if (!cents.isNullAt(i)) {
        val s = cents.getStruct(i, 2)
        if (!s.isNullAt(0) && !s.isNullAt(1)) {
          val cid = s.getLong(0)
          val sim = BestCell.round6(VectorOps.cosine(v, s.getArray(1)))
          if (!has) { bestCid = cid; bestSim = sim; has = true }
          else {
            val c = BestCell.cmp(sim, bestSim)
            if (c > 0 || (c == 0 && cid < bestCid)) {
              bestCid = cid; bestSim = sim
            }
          }
        }
      }
      i += 1
    }
    if (!has) null
    else new GenericInternalRow(Array[Any](bestCid, bestSim))
  }

  override protected def nullSafeEval(v: Any, c: Any): Any =
    compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bestCell", this, classOf[BestCell].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"""
      ${ev.value} = $ref.compute($v, $c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCell =
    copy(left = newLeft, right = newRight)
}

/** Native L2 normalization v / max(|v|, 1e-12) — the spherical-k-means
  * refit's per-row step. Replaces the interpreted
  * `transform(v, x => x / greatest(sqrt(aggregate(v, 0, +x²)), 1e-12))`
  * HOF chain (one lambda dispatch per element per row, and the norm fold
  * re-evaluated per element) with one two-pass primitive loop.
  * Parity with the HOF chain, including its corners: a null ELEMENT makes
  * the `aggregate` fold null, `greatest(null, 1e-12)` = 1e-12 (greatest
  * skips nulls), and the transform maps null elements to null; a NaN
  * element gives a NaN norm, and greatest's nan-safe ordering keeps NaN
  * (it is "greatest"). */
case class VecNormalize(child: Expression)
    extends UnaryExpression with DoubleArrayInputs {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_normalize"
  override protected def nVectorArgs: Int = 1

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var ss = 0.0
    var hasNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true
      else { val x = arr.getDouble(i); ss += x * x }
      i += 1
    }
    val denom =
      if (hasNull) 1e-12
      else {
        val nrm = math.sqrt(ss)
        if (BestCell.cmp(nrm, 1e-12) >= 0) nrm else 1e-12
      }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = arr.getDouble(i) / denom
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecNormalize", this,
      classOf[VecNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNormalize =
    copy(child = newChild)
}

object VecNormalize {
  def apply(v: Column): Column =
    ColumnBridge.column(VecNormalize(ColumnBridge.expression(v)))
}
