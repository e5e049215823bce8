package graft.datapipe

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Lake profiling diagnostics — the reports read BEFORE picking a join or
  * partitioning strategy at 100 TB: which keys are hot (salting / AQE
  * skew-join candidates), and what each column's null/distinct shape is
  * (broadcast-ability, bucketing keys, dead columns).
  */
object Profile {

  /** Top-k hottest values of a prospective join/groupBy key with their
    * corpus share. Plans as a two-phase count + `TakeOrderedAndProject`
    * (plan-pinned) — the global top-k never materializes a full sort; ties
    * broken by key so the report is deterministic. The denominator is
    * `df.count()` — sum-of-group-counts ≡ row count, and a bare count over
    * a columnar source is metadata-only, so no key-cardinality cache needs
    * to be pinned (and leaked) between a scalar-total action and the
    * top-k pass. */
  def hotKeys(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
      .select(col("key"), col("n"),
        round(col("n").cast("double") / total, 6).as("share"))
  }

  /** Per-column profile in long form: (column, n_rows, n_null,
    * n_distinct). One unpivot (values carried as strings) and one
    * two-phase aggregate keyed by column name — #cols keys, trivially
    * balanced. Exact distinct counts are the oracle-checkable form used
    * here; at lake scale swap `countDistinct` for
    * `approx_count_distinct` (same plan shape, sketch exchange). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val entries: Seq[Column] = cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v")))
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"))
  }

  /** The lake-scale form of [[columnProfile]]: HyperLogLog++ sketches
    * (`approx_count_distinct`, rsd 2%) instead of exact distincts. The
    * exact form plans an Expand (one duplicated stream per distinct
    * aggregate) plus a second aggregate over the expanded keys — at 100 TB
    * that is a corpus-width exchange of every profiled VALUE; the sketch
    * form is one aggregate whose exchange carries #cols fixed-size HLL
    * buffers (plan-pinned in PlanSpec: no Expand, single agg pair). */
  def columnProfileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    val entries: Seq[Column] = cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v")))
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        approx_count_distinct(col("v"), 0.02).as("n_distinct_approx"))
  }
}
