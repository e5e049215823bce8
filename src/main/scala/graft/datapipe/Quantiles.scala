package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key quantiles for BOUNDED-RESOLUTION values — the curation
  * primitive behind "keep the top p% by quality per source".
  *
  * At 100 TB an exact quantile by global sort is a non-starter and
  * `percentile_approx` (t-digest) is not oracle-reproducible. But curation
  * scores are bounded-resolution by construction (quality is rounded to 4
  * decimals → ≤ 10_001 distinct values), so the exact quantile reduces to
  * a two-phase COUNT-BY-VALUE aggregate: the corpus-wide pass is
  * `groupBy(key, value).count()` (map-side partial aggregation absorbs hot
  * values — same skew argument as chunkDedup's first-occurrence agg), and
  * the interpolation runs over the tiny (key × distinct-value) table. The
  * per-key window there sorts ≤ value-resolution rows per key, never the
  * corpus. Interpolation follows the standard continuous-quantile rule
  * (DuckDB `quantile_cont`, NumPy `linear`): h = (n−1)·p, result =
  * v⌊h⌋ + (h−⌊h⌋)·(v⌊h⌋₊₁ − v⌊h⌋).
  */
object Quantiles {

  /** Per-key continuous quantiles of `value` at each p in `ps`.
    * Output: (key, n_rows, q_<p-tag>…) — one row per key, one column per
    * requested quantile, rounded to `scale` decimals. */
  def byKey(df: DataFrame, key: String, value: Column, ps: Seq[Double],
            scale: Int = 4): DataFrame =
    ofCounts(countsByValue(df, key, value), key, ps, scale)

  /** The corpus-wide reduction on its own: (key, v, cnt) count-by-value.
    * Exposed as the state a STREAMING quantile refresh maintains — counts
    * compose over any batch split (sum is associative), so merged per-batch
    * deltas are exactly the one-shot counts ([[graft.streaming.StreamingQuantiles]]). */
  def countsByValue(df: DataFrame, key: String, value: Column): DataFrame =
    df.select(col(key), value.as("v"))
      .where(col("v").isNotNull)
      .groupBy(col(key), col("v"))
      .agg(count(lit(1)).as("cnt"))

  /** Interpolation over an already-reduced (key, v, cnt) table. */
  def ofCounts(counts: DataFrame, key: String, ps: Seq[Double],
               scale: Int = 4): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    // cumulative count within key, ascending by value: row covers 0-based
    // ranks [cum - cnt, cum). Window input is ≤ distinct-values rows per
    // key — bounded by value resolution, independent of corpus size.
    val wOrd = Window.partitionBy(key).orderBy(col("v"))
    val wAll = Window.partitionBy(key)
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val qCols = ps.map { p =>
      // h = (n-1)p; v_k = smallest v whose cumulative count exceeds k,
      // i.e. min v with cum >= k+1 (0-based rank k exists: k <= n-1).
      // For p < 1, k+1 <= n-1 so v_{k+1} exists; for p = 1 the frac is 0
      // and the coalesce never contributes.
      val h = (col("n") - 1) * lit(p)
      val k = floor(h)
      val vk = min(when(col("cum") >= k + 1, col("v")))
      val vk1 = min(when(col("cum") >= k + 2, col("v")))
      round(vk + (h - k) * (coalesce(vk1, vk) - vk), scale).as(tag(p))
    }
    // n is constant per key — grouping on it (rather than referencing it
    // inside the aggregates) is what makes the h/k rank arithmetic legal
    cum.groupBy(col(key), col("n"))
      .agg(qCols.head, qCols.tail: _*)
      .select(col(key) +: col("n").as("n_rows") +: ps.map(p => col(tag(p))): _*)
  }

  /** p → column name in percent points: 0.5 → q50, 0.9 → q90, 0.05 → q05. */
  def tag(p: Double): String = f"q${(p * 100).round}%02d"

  /** The curation ACTION: rows whose value reaches their key's p-quantile
    * ("keep the top (1−p) share per source"). The per-key thresholds are a
    * tiny dimension — broadcast back to the corpus, no corpus shuffle. */
  def keepAboveQuantile(df: DataFrame, key: String, value: Column, p: Double,
                        scale: Int = 4): DataFrame = {
    val thresholds = byKey(df, key, value, Seq(p), scale)
      .select(col(key), col(tag(p)).as("q_threshold"))
    df.withColumn("v", round(value, scale))
      .join(broadcast(thresholds), Seq(key))
      .where(col("v") >= col("q_threshold"))
      .drop("v", "q_threshold")
  }
}
