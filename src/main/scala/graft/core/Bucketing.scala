package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins and aggregations.
  *
  * At 100 TB the dominant cost of the KG build's repeated self- and
  * equi-joins (triples ⋈ canon_map on subj, blog trees ⋈ parents on mid,
  * dedup groupBys on the composite key) is the shuffle. Writing the hot
  * tables bucketed by their join key removes it: two tables bucketed into
  * the same number of buckets on the join key plan a SortMergeJoin with NO
  * Exchange on either side — each task reads matching bucket files
  * directly. That is the standard lake-layout contract (Hive bucketing /
  * Iceberg bucket partition transform); the reference has no analogue (it
  * re-hashes in driver HashMaps every run — e.g. FromScrappyDump.kt's
  * per-scan rebuild), but any Spark engine at this scale pre-buckets.
  *
  * Guidance encoded here:
  *   - bucket count should be a multiple of the cluster's parallelism and
  *     sized so one bucket of the BIG table fits an executor's memory;
  *   - both join sides must agree on (key, bucket count) — enforced by
  *     writing through the same spec;
  *   - bucketed writes must not also be sorted by a different column, or
  *     the per-bucket sort is wasted for the merge join.
  */
object Bucketing {

  /** One bucket layout both sides of a co-located join must share. */
  final case class BucketSpec(key: String, buckets: Int)

  /** Write `df` as a bucketed managed table (parquet). Spark only persists
    * bucket metadata through the catalog, so this is saveAsTable, not a
    * path write. Sorting within buckets by the key makes downstream
    * SortMergeJoins skip their sort too. */
  def writeBucketed(df: DataFrame, table: String, spec: BucketSpec): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(spec.buckets, spec.key)
      .sortBy(spec.key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back with bucket metadata intact. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Co-located equi-join of two tables previously written with the SAME
    * spec: planned with zero Exchange (verified in BucketingSpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    spec: BucketSpec): DataFrame =
    readBucketed(spark, left).join(readBucketed(spark, right), spec.key)

  /** Rewrite an append-grown bucketed table into one file per bucket.
    *
    * The committed-store operators (`Dedup.incrementalDedupCommit`,
    * `Dedup.incrementalFuzzyCommit`, `LmScore.commitModel` refreshes)
    * bucket-APPEND per batch, and every append lays its own file set into
    * every bucket — after a year of daily batches each bucket holds ~365
    * fragments and the scan side of the co-located join pays per-file open
    * costs that dwarf the data. This is the maintenance pass a lake runs
    * off-peak: read, cluster one-task-per-bucket (`repartition` on the
    * bucket key, same trick as the shard writer — otherwise every write
    * task leaves a sliver in every bucket), rewrite, swap via catalog
    * renames. Values, bucket spec, and the zero-Exchange join plan are all
    * preserved (BucketingSpec pins file count AND plan).
    *
    * Swap discipline (catalog renames are NOT atomic as a pair): the live
    * name is vacated for the smallest possible window — RENAME live→old,
    * RENAME new→live, DROP old — and a crash at any step is recoverable:
    * the data always exists under `table`, `table_old`, or both (the
    * `_compacting` copy is a duplicate until `_old` is dropped). A
    * restarted compact first heals a previous half-swap — if the live name
    * is missing it renames `_old` back — so the committed-store readers
    * (which treat a missing table as an empty store) can never observe the
    * store as absent after recovery runs. */
  def compact(spark: SparkSession, table: String, spec: BucketSpec): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val tmp = table + "_compacting"
    val old = table + "_old"
    // heal a crashed previous swap: live name vacated but _old still there
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(old))
      spark.sql(s"ALTER TABLE $old RENAME TO $table")
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.sql(s"DROP TABLE IF EXISTS $old")
    // cluster on the writer's OWN bucket-id formula (pmod(murmur3, n)) via
    // a range partition — one task per bucket id, so one file per bucket;
    // a plain repartition on the key hashes partition ids independently of
    // bucket ids and every task still writes into every bucket
    writeBucketed(
      spark.table(table)
        .repartitionByRange(spec.buckets,
          pmod(hash(col(spec.key)), lit(spec.buckets))),
      tmp, spec)
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.sql(s"DROP TABLE $old")
  }
}
