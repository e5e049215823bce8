package graft.core

import org.apache.spark.sql.types._

/** Typed row shapes at stage boundaries (SURVEY.md §1.3).
  *
  * The primary input contract is the interleaved-docs table from
  * BASELINE.json's input_hint — the Spark image of the reference's
  * semi-structured scrapy rows (reference: weibo/FromScrappyDump.kt:354–372,
  * field kinds :162–348).
  */
object Schemas {

  /** One interleaved fragment of a document. `kind` selects the parse shape
    * the way the reference dispatches on JSON field names + `version`
    * (FromScrappyDump.kt:376–383). `offset` preserves the original order —
    * the per-row invariant is span-sequence equality on
    * (kind, text, media_ref, order). */
  case class Span(kind: String, text: String, media_ref: String, offset: Int)

  case class Doc(doc_id: String, spans: Seq[Span])

  /** KB dimension rows — the pre-materialized image of the reference's
    * HTTP API + SQLite cache (cndbpedia/APIRequestCache.kt:85–105). */
  case class Ment2Ent(mention: String, entities: Seq[String])
  case class AvPair(entity: String, pred: String, obj: String)

  /** The P/R comparison unit (golden comparison is on distinct
    * (subj, pred, obj)); doc_id/span_offset are provenance/lineage. */
  case class Triple(subj: String, pred: String, obj: String,
                    doc_id: String, span_offset: Int)

  /** Labeled-property-graph output (reference node model:
    * Neo4jGraph.kt:56–73; edges: extentFunctions.kt:30–38). */
  case class Vertex(vertex_id: Long, name: String, labels: Seq[String])
  case class Edge(src: Long, dst: Long, rel: String)

  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("text", StringType),
    StructField("media_ref", StringType),
    StructField("offset", IntegerType)))

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(spanType))))

  val ment2entSchema: StructType = StructType(Seq(
    StructField("mention", StringType, nullable = false),
    StructField("entities", ArrayType(StringType))))

  val avpairSchema: StructType = StructType(Seq(
    StructField("entity", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj", StringType, nullable = false)))

  val triplesSchema: StructType = StructType(Seq(
    StructField("subj", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj", StringType, nullable = false),
    StructField("doc_id", StringType),
    StructField("span_offset", IntegerType)))
}
