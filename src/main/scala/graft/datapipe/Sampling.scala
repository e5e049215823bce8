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

  /** Token-budget mix rebalancing: derive the per-stratum keep RATES that
    * realize target token SHARES (`weights`, e.g. en→0.5, code→0.2), then
    * sample deterministically at those rates. Downsampling-only (no
    * upsampling/repetition): the largest achievable total budget is
    * X = min_s(T_s / w_s) — the stratum that hits its own supply first
    * caps the corpus — and every stratum then keeps
    * r_s = w_s · X / T_s ≤ 1 of its tokens. Strata without a positive
    * weight are dropped entirely.
    *
    * Scale shape: the totals pass is one two-phase aggregate over a
    * narrow (stratum, token-count) projection; the rates table has one
    * row per stratum (tiny by definition) and joins back to the corpus
    * as a broadcast; the keep decision is the same codegen'd hash-mod
    * filter as [[stratified]] — reproducible across runs, partitionings
    * and engines, so an incremental re-ingestion reselects the same
    * documents. Returns (stratum, n_tokens, rate). */
  def rebalanceRates(docs: DataFrame, strataCol: String, tokenCount: Column,
                     weights: Map[String, Double]): DataFrame = {
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, f).otherwise(acc)
    }
    val totals = docs.groupBy(strataCol)
      .agg(sum(tokenCount.cast("long")).as("n_tokens"))
      .withColumn("w", w).filter(col("w") > 0)
    val budget = totals
      .agg(min(col("n_tokens").cast("double") / col("w")).as("x"))
    totals.crossJoin(budget)
      .select(col(strataCol), col("n_tokens"),
        least(lit(1.0),
          col("w") * col("x") / col("n_tokens").cast("double")).as("rate"))
  }

  /** Apply [[rebalanceRates]]: the kept rows of `docs` under the derived
    * per-stratum rates (strata with no positive weight vanish — inner
    * join against the rates dim). */
  def rebalance(docs: DataFrame, idCol: String, strataCol: String,
                tokenCount: Column, weights: Map[String, Double]): DataFrame = {
    val rates = rebalanceRates(docs, strataCol, tokenCount, weights)
      .select(col(strataCol), col("rate"))
    docs.join(broadcast(rates), Seq(strataCol))
      .filter(hashFraction(col(idCol)) < col("rate"))
      .drop("rate")
  }
}
