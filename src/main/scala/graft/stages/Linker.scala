package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-link candidate scoring — the north star's "batched entity-link
  * scoring per partition".
  *
  * The reference resolves a mention to ALL its KB entities and crawls each
  * (AbstractSubjectGraph.kt:17–29), so the KG construction path keeps that
  * semantics (and the golden P/R gate pins it). This stage is the ranking
  * surface on top: for every detected (doc, span, mention) and each
  * candidate entity, a deterministic context-overlap score — Jaccard over
  * distinct character BIGRAMS (CJK-appropriate; whitespace tokens are
  * useless on unsegmented text) between the span text and the entity's KB
  * attribute profile.
  *
  * Shape: the mention stream joins two BROADCAST dimensions (ment2ent and
  * the entity profiles), so scoring runs batched inside each partition of
  * the doc-derived stream — no shuffle of per-doc rows; the only wide op is
  * the per-(doc,span,mention) rank window, partitioned by a high-cardinality
  * composite key.
  */
object Linker {

  /** Distinct character bigrams of a string (single-char strings yield the
    * string itself — same convention as Canon's blocking). */
  def bigrams(c: Column): Column =
    array_distinct(
      when(length(c) >= 2,
        transform(sequence(lit(1), length(c) - 1), i => c.substr(i, lit(2))))
        .otherwise(array(c)))

  /** entity → distinct attribute-value bigram profile, from avpair. */
  def entityProfiles(avpair: DataFrame): DataFrame =
    avpair.select(col("entity"), explode(bigrams(col("obj"))).as("bg"))
      .distinct()
      .groupBy("entity").agg(sort_array(collect_set(col("bg"))).as("profile"))

  /** Score all candidate links.
    * @param detected  (doc_id, span_offset, text, mention) rows
    * @param ment2entFlat (mention, entity) dimension
    * @param profiles  output of [[entityProfiles]]
    * @return (doc_id, span_offset, mention, entity, score, rank) — rank 1 is
    *         the best-scoring candidate per (doc, span, mention). */
  def scoreCandidates(detected: DataFrame, ment2entFlat: DataFrame,
                      profiles: DataFrame): DataFrame = {
    val ctx = detected.select(col("doc_id"), col("span_offset"), col("mention"),
      bigrams(col("text")).as("ctxb"))
    val inter = size(array_intersect(col("ctxb"), col("profile")))
    val scored = ctx
      .join(broadcast(ment2entFlat), Seq("mention"))
      .join(broadcast(profiles), Seq("entity"))
      .select(col("doc_id"), col("span_offset"), col("mention"), col("entity"),
        round(inter.cast("double") /
          (size(col("ctxb")) + size(col("profile")) - inter).cast("double"), 6)
          .as("score"))
    val w = Window.partitionBy("doc_id", "span_offset", "mention")
      .orderBy(col("score").desc, col("entity").asc)
    scored.withColumn("rank", row_number().over(w))
  }
}
