package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data mixes.
  *
  * `rand(seed)` sampling is partition-order-dependent (a repartition or a
  * rerun over different splits changes the sample); hash-mod sampling keys
  * the decision to the ROW ID, so the sample is reproducible across runs,
  * engines (the DuckDB oracle recomputes it bit-for-bit), repartitions and
  * incremental re-ingestion — the property a training-mix manifest needs.
  * One narrow scan, no shuffle; the selection predicate pushes into the
  * scan like any other filter.
  */
object Sampling {

  /** Uniform [0, 1) from the id: first 8 md5 hex chars / 2^32. */
  def hashFraction(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Keep ~`fraction` of rows, deterministically by id. */
  def sampleFraction(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashFraction(col(idCol)) < fraction)

  /** Stratified deterministic sampling: per-stratum keep fractions (the
    * training-mix weights — e.g. downsample web text, keep all code).
    * Strata absent from `fractions` fall back to `default`. The fractions
    * table is a literal when-chain (strata counts are tiny by definition);
    * the whole operator stays a single codegen'd filter over the scan. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 fractions: Map[String, Double],
                 default: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, f).otherwise(acc)
    }
    df.filter(hashFraction(col(idCol)) < frac)
  }
}
