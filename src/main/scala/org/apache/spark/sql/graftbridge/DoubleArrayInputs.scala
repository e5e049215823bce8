package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DoubleType, LongType, StructField, StructType}

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

/** Input contract "(array<double> vector, array<struct<cid: bigint,
  * cv: array<double>>> centroid table)" — the BestCell argmax expression.
  * Lives here for the same `AbstractDataType`-visibility reason as
  * [[DoubleArrayInputs]]. */
trait VectorAndCentroidsInputs extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType),
      ArrayType(StructType(Seq(
        StructField("cid", LongType),
        StructField("cv", ArrayType(DoubleType))))))
}
