package graft

import graft.core.Schemas.Doc
import graft.gen.{Corpus, CorpusData}
import graft.streaming.StreamingKg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Structured-Streaming incremental ingestion: micro-batches land epoch
  * snapshots; overlapping re-delivery is idempotent (anti-join dedup); the
  * accumulated set equals the batch pipeline's raw triples on the same docs. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = Corpus.Config(nDocs = 300, nEntities = 120, seed = 42L)

  test("micro-batched ingestion = batch semantics; re-delivery is idempotent") {
    val kb = Corpus.kb(cfg)
    val all = Corpus.docs(cfg).toVector
    val (b1, b2) = all.splitAt(150)
    val m2e = CorpusData.ment2entDF(spark, cfg)
    val av = CorpusData.avpairDF(spark, cfg)

    val tableDir = Files.createTempDirectory("stream-table").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = StreamingKg.start(spark, stream.toDF(), m2e, av, tableDir, ckpt)
    stream.addData(b1)
    q.processAllAvailable()
    val after1 = StreamingKg.landed(spark, tableDir).count()
    assert(after1 > 0)
    // second batch overlaps the first (re-delivery) + brings new docs
    stream.addData(b1.take(50) ++ b2)
    q.processAllAvailable()
    q.stop()

    val landed = StreamingKg.landed(spark, tableDir)
      .select("subj", "pred", "obj")
      .as[(String, String, String)].collect()
    // no duplicates across epochs despite the overlap
    assert(landed.length === landed.toSet.size)

    // equals the batch pipeline's raw (pre-canonicalization) triples
    val batchRaw = StreamingKg.batchTriples(spark,
      CorpusData.docsDF(spark, cfg), m2e, av)
      .select("subj", "pred", "obj")
      .as[(String, String, String)].collect().toSet
    assert(landed.toSet === batchRaw)
  }

  test("long run: key compaction bounds the per-batch dedup inputs") {
    val cfg10 = Corpus.Config(nDocs = 200, nEntities = 60, seed = 7L)
    val all = Corpus.docs(cfg10).toVector
    val m2e = CorpusData.ment2entDF(spark, cfg10)
    val av = CorpusData.avpairDF(spark, cfg10)
    val tableDir = Files.createTempDirectory("stream-table10").toString
    val ckpt = Files.createTempDirectory("stream-ckpt10").toString
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = StreamingKg.start(spark, stream.toDF(), m2e, av, tableDir, ckpt,
      compactEvery = 3)
    // 10 micro-batches, each overlapping the previous (re-delivery pattern)
    all.grouped(20).take(10).zipWithIndex.foreach { case (chunk, i) =>
      stream.addData(if (i == 0) chunk else all.slice(i * 20 - 10, i * 20) ++ chunk)
      q.processAllAvailable()
    }
    q.stop()
    val io = new graft.core.TableIO(spark, tableDir)
    // compaction ran and covers all but a bounded epoch tail
    val covered = io.counterOf("committed_keys", "covers_epochs").get
    val last = io.lastCommitted("stream_triples")
    assert(covered >= last - 3,
      s"key snapshot lags: covers $covered of $last epochs")
    // exact global dedup held across all 10 epochs
    val landed = StreamingKg.landed(spark, tableDir)
      .select("subj", "pred", "obj")
      .as[(String, String, String)].collect()
    assert(landed.length === landed.toSet.size)
    val batchRaw = StreamingKg.batchTriples(spark,
      CorpusData.docsDF(spark, cfg10), m2e, av)
      .select("subj", "pred", "obj")
      .as[(String, String, String)].collect().toSet
    assert(landed.toSet === batchRaw)
  }
}
