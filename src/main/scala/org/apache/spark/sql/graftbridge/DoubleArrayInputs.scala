package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DoubleType}

/** Implicit-cast input contract "N array<double> arguments" for graft's
  * native expressions. `AbstractDataType` is `private[sql]` in Spark 4, so
  * the trait lives in the bridge package (same technique as ColumnBridge);
  * mixing it in makes the analyzer coerce decimal/float arrays at analysis
  * time instead of a runtime ClassCastException from SQL callers. */
trait DoubleArrayInputs extends ImplicitCastInputTypes { self: Expression =>
  protected def nVectorArgs: Int
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(nVectorArgs)(ArrayType(DoubleType))
}
