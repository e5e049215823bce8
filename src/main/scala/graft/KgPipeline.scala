package graft

import graft.core.{Rules, TableIO}
import graft.stages._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction dataflow (the north star):
  *
  *   docs ─► normalize (narrow) ─► weibo triples
  *        ─► text spans ─► trie mention detect ─► distinct mentions
  *        ─► KB BFS expand (broadcast dims, anti-join visited)
  *        ─► canonicalize (alias CC, salted) ─► two-phase triple dedup
  *        ─► vertices / edges materialize
  *
  * Each stage optionally checkpoints through [[TableIO]] (Iceberg-style
  * snapshot + lineage manifest); a killed run resumes from the last committed
  * snapshot, skipping finished stages entirely.
  */
object KgPipeline {

  case class Outputs(triples: DataFrame, vertices: DataFrame, edges: DataFrame)

  /** text spans of every doc: (doc_id, span_offset, text) — one explode. */
  def textSpans(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "text" && col("s.text").isNotNull)
      .select(col("doc_id"), col("s.offset").as("span_offset"), col("s.text").as("text"))

  /** Canonicalized distinct triple set with provenance. */
  def run(spark: SparkSession, docs: DataFrame, ment2ent: DataFrame,
          avpair: DataFrame, io: Option[TableIO] = None,
          shufflePartitions: Int = 32): Outputs = {

    def stage(name: String, upstream: Seq[String])(f: => DataFrame): DataFrame =
      io match {
        case Some(t) => t.runOrResume(name, upstream)(f)
        case None => f
      }

    val weibo = stage("weibo_triples", Seq.empty) {
      WeiboTriples.emit(Normalize.blogs(docs), Normalize.comments(docs))
    }

    val kb = stage("kb_triples", Seq.empty) {
      val dict = ment2ent.select("mention").distinct()
        .collect().map(_.getString(0)).toSeq // bounded dictionary (dim table)
      val mentions = Mentions.detect(spark, textSpans(docs), dict)
        .select(col("mention")).distinct()
      KbExpand.expand(spark, mentions, ment2ent, avpair, Rules.recursivePreds)
    }

    val kbT = kb.select(col("subj"), col("pred"), col("obj"),
      lit(null).cast("string").as("doc_id"), lit(-1).as("span_offset"))

    // the CC pass runs once and is snapshot-committed: resume never re-iterates
    val canonMap = stage("canon_map", Seq("kb_triples")) {
      Canon.canonicalMap(kb, Rules.categoryPred, Rules.aliasPreds)
    }

    val triples = stage("triples", Seq("weibo_triples", "kb_triples", "canon_map")) {
      val all = Canon.canonicalize(weibo.unionByName(kbT), canonMap)
      // two-phase dedup with explicit exchange width (SURVEY.md §4.2.5):
      // partial hash-agg per partition, one shuffle on subj, final agg.
      all
        .repartition(shufflePartitions, col("subj"))
        .groupBy("subj", "pred", "obj")
        .agg(min(col("doc_id")).as("doc_id"),
          min(col("span_offset")).as("span_offset"))
    }

    val labels = Canon.nodeLabels(
      Canon.canonicalize(kbT, canonMap), Rules.categoryPred)

    val vertices = stage("vertices", Seq("triples")) {
      GraphOut.vertices(triples, labels, shufflePartitions)
    }
    val edges = stage("edges", Seq("triples")) {
      GraphOut.edges(triples, shufflePartitions)
    }
    Outputs(triples, vertices, edges)
  }
}
