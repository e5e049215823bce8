package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — live JDBC batch source (FromScrappyDump.kt:354–358 reads MySQL
  * through a single connection; here the same scan is a PARTITIONED Spark
  * JDBC read — numPartitions concurrent range queries on the id column, so
  * the database scan parallelizes with the cluster instead of serializing
  * on one cursor).
  *
  * The engine's default ingestion path replaces the row-store entirely with
  * columnar parquet snapshots (documented by-design in COVERAGE.md §2.1);
  * this source is the drop-in for deployments whose upstream IS a JDBC
  * store, exercised for real against embedded Derby in JdbcSourceSpec.
  */
object Jdbc {

  /** Partitioned full-table scan: `numPartitions` parallel range queries
    * over `[lowerBound, upperBound]` of the numeric `partitionCol`. Bounds
    * only steer the split points — rows outside them are still read (Spark
    * contract), so the scan is always complete. */
  def read(spark: SparkSession, url: String, table: String,
           partitionCol: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int, driver: String = derbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Incremental scan from a high-water mark — the reference's
    * `where id > $earliestId` pattern (FromScrappyDump.kt:352–357): only
    * rows past the last committed id are fetched, pushed down INTO the
    * database query (not filtered client-side). The predicate goes through
    * Spark's JDBC filter pushdown over a plain `dbtable` read — no raw SQL
    * interpolation of caller-supplied identifiers (a table/column name with
    * SQL metacharacters must fail validation, not splice into the query). */
  def readIncremental(spark: SparkSession, url: String, table: String,
                      idCol: String, highWaterMark: Long,
                      driver: String = derbyDriver): DataFrame = {
    val ident = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?".r
    require(ident.matches(table), s"invalid table identifier: $table")
    require(ident.matches(idCol) && !idCol.contains("."),
      s"invalid column identifier: $idCol")
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .load()
      .filter(org.apache.spark.sql.functions.col(idCol) > highWaterMark)
  }

  /** Embedded Derby — the JDBC engine shipped with Spark's own jars, used
    * by JdbcSourceSpec so the path is exercised without network egress. */
  val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** The reference's restart loop composed with the snapshot layer (S1+S5):
    * read only rows past the last COMMITTED high-water mark, snapshot-append
    * them, and carry the new mark in the snapshot's manifest counters
    * (FromScrappyDump.kt:352–357's `where id > $earliestId` + :392–406's
    * periodic commit). A killed run resumes from the committed mark — rows
    * already snapshotted are never re-fetched from the database; a run that
    * finds nothing new commits nothing. Returns the rows ingested.
    *
    * `io.readAll(stage)` is then the full ingested table (epoch-append
    * semantics, one snapshot per ingest run). */
  def ingestIncremental(spark: SparkSession, io: graft.core.TableIO,
                        stage: String, url: String, table: String,
                        idCol: String, driver: String = derbyDriver): Long = {
    import org.apache.spark.sql.functions._
    val hwm = io.counterOf(stage, "high_water_mark").getOrElse(0L)
    // one database scan: the incremental batch is pinned with localCheckpoint
    // so the max-id probe and the snapshot write both read executor blocks
    val batch = readIncremental(spark, url, table, idCol, hwm, driver)
      .localCheckpoint()
    val agg = batch.agg(max(col(idCol).cast("long")), count(lit(1))).collect()(0)
    if (agg.isNullAt(0)) 0L
    else {
      io.commit(stage, batch, counters = Map(
        "high_water_mark" -> agg.getLong(0),
        "rows_ingested" -> agg.getLong(1)))
      agg.getLong(1)
    }
  }
}
