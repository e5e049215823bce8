package graft

import graft.core.Rules
import graft.gen.{Corpus, CorpusData}
import graft.stages._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch per-stage timing harness (not part of the driver contract). */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 100000
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Corpus.Config(nDocs = nDocs)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = CorpusData.docsDF(spark, cfg)
    val m2e = CorpusData.ment2entDF(spark, cfg)
    val av = CorpusData.avpairDF(spark, cfg)

    time("docs.count")(docs.count())
    val weibo = WeiboTriples.emit(Normalize.blogs(docs), Normalize.comments(docs))
    time("weibo.count")(weibo.count())
    val dict = m2e.select("mention").distinct().collect().map(_.getString(0)).toSeq
    val mentions = time("mentions.distinct") {
      val m = Mentions.detect(spark, KgPipeline.textSpans(docs), dict)
        .select(col("mention")).distinct().localCheckpoint()
      m.count(); m
    }
    val kb = time("kb.expand") {
      val k = KbExpand.expand(spark, mentions, m2e, av, Rules.recursivePreds).localCheckpoint()
      k.count(); k
    }
    val canonMap = time("canon_map") {
      val c = Canon.canonicalMap(kb, Rules.categoryPred, Rules.aliasPreds).localCheckpoint()
      c.count(); c
    }
    val kbT = kb.select(col("subj"), col("pred"), col("obj"),
      lit(null).cast("string").as("doc_id"), lit(-1).as("span_offset"))
    val weiboC = weibo.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val triples = Canon.canonicalize(weiboC.unionByName(kbT), canonMap)
      .groupBy("subj", "pred", "obj")
      .agg(min(col("doc_id")).as("doc_id"), min(col("span_offset")).as("span_offset"))
    time("triples.dedup+count")(triples.count())

    time("full KgPipeline.run") {
      val o = KgPipeline.run(spark, docs, m2e, av, shufflePartitions = cpus)
      o.triples.count()
    }
    spark.stop()
  }
}
