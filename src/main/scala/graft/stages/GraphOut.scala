package graft.stages

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage 5 — materialize the deduplicated labeled-property graph.
  *
  * Replaces the reference's transactional Neo4j MERGE writes
  * (extentFunctions.kt:20–38, Neo4jGraph.kt:56–96) with columnar tables:
  *   vertices(vertex_id, name, labels)   edges(src, dst, rel)
  *
  * Ids are stable `xxhash64(name)` — no transactional counter (SURVEY.md
  * §7.4); contiguous ids exist only in the small export path (window
  * row_number over the export set, DumpGraphToText.kt:93–108 image).
  * Dedup is the north-star two-phase hash aggregate: Catalyst already plans
  * partial-per-partition + final for dropDuplicates; we repartition on the
  * dedup key first so the final exchange width is explicit.
  */
object GraphOut {

  /** Every subj and every obj becomes a vertex — the reference merges a node
    * for each triple endpoint, literals included (AbstractSubjectGraph.kt:
    * 22–33 merges toMention for every AV pair). */
  def vertices(triples: DataFrame, labelsByName: DataFrame, parts: Int): DataFrame = {
    val names = triples.select(col("subj").as("name"))
      .unionByName(triples.select(col("obj").as("name")))
      .repartition(parts, col("name"))
      .dropDuplicates("name")
    names.join(labelsByName, Seq("name"), "left")
      .select(xxhash64(col("name")).as("vertex_id"), col("name"),
        coalesce(col("labels"), array()).as("labels"))
  }

  def edges(triples: DataFrame, parts: Int): DataFrame =
    triples
      .select(xxhash64(col("subj")).as("src"), xxhash64(col("obj")).as("dst"),
        col("pred").as("rel"))
      .repartition(parts, col("src"), col("dst"), col("rel"))
      .dropDuplicates("src", "dst", "rel")

  /** Small-export path: contiguous integer ids in deterministic order
    * (DumpGraphToText.kt:93–108's buildEntityIndex, made deterministic by
    * ordering on name instead of arrival). Single-partition window — export
    * scale only, never in the core pipeline. */
  def exportIds(vertices: DataFrame): DataFrame =
    vertices.withColumn("export_id",
      // literal partition key: single partition as before (export scale),
      // without the WindowExec no-partition warning
      row_number().over(Window.partitionBy(lit(0)).orderBy(col("name"))) - 1)
}
