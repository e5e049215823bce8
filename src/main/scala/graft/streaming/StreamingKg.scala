package graft.streaming

import graft.core.{Rules, TableIO}
import graft.stages._
import graft.KgPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming seam (SURVEY.md §2.7).
  *
  * The reference is batch-only but streaming-shaped: incremental scan from a
  * high-water mark (FromScrappyDump.kt:352–357), periodic 500k-row flush
  * (:392–406), buffer reset after commit (WeiboManager.kt:42–45). Here each
  * micro-batch runs the SAME stage functions as the batch pipeline inside
  * `foreachBatch`, deduplicates against the already-committed triple set
  * (left_anti — the streaming image of the reference's REPLACE-upsert), and
  * appends an epoch snapshot whose manifest records the batch id as the
  * high-water mark. A killed stream restarted from the same checkpoint +
  * table dir re-delivers only uncommitted batches (foreachBatch exactly-once
  * via the query checkpoint, idempotent via the anti-join).
  *
  * Canonicalization is deliberately a downstream BATCH stage over the
  * accumulated triples (alias components are global — a per-batch canon
  * would be wrong); the streaming layer lands raw triples.
  */
object StreamingKg {

  /** Per-batch transformation: docs micro-batch → new distinct raw triples. */
  def batchTriples(spark: SparkSession, batch: DataFrame,
                   ment2ent: DataFrame, avpair: DataFrame): DataFrame = {
    val weibo = WeiboTriples.emit(Normalize.blogs(batch), Normalize.comments(batch))
    val dict = ment2ent.select("mention").distinct()
      .collect().map(_.getString(0)).toSeq
    val mentions = Mentions.detect(spark, KgPipeline.textSpans(batch), dict)
      .select(col("mention")).distinct()
    val kb = KbExpand.expand(spark, mentions, ment2ent, avpair,
      Rules.recursivePreds, driverThreshold = 2000000L)
    weibo.unionByName(kb.select(col("subj"), col("pred"), col("obj"),
        lit(null).cast("string").as("doc_id"), lit(-1).as("span_offset")))
      .groupBy("subj", "pred", "obj")
      .agg(min(col("doc_id")).as("doc_id"), min(col("span_offset")).as("span_offset"))
  }

  /** Start the incremental ingestion query. `tableDir` accumulates epoch
    * snapshots under stage `stream_triples`. */
  def start(spark: SparkSession, docsStream: DataFrame, ment2ent: DataFrame,
            avpair: DataFrame, tableDir: String, checkpointDir: String): StreamingQuery = {
    val io = new TableIO(spark, tableDir)
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fresh = batchTriples(spark, batch, ment2ent, avpair)
        val novel =
          if (io.hasCommitted("stream_triples"))
            fresh.join(io.readAll("stream_triples"),
              Seq("subj", "pred", "obj"), "left_anti")
          else fresh
        io.commit("stream_triples", novel,
          counters = Map("batch_id" -> batchId))
        ()
      }
      .start()
  }

  /** All triples landed so far (union of epoch snapshots, distinct by key). */
  def landed(spark: SparkSession, tableDir: String): DataFrame =
    new TableIO(spark, tableDir).readAll("stream_triples")
}
