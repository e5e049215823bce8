package graft.sources

import graft.functions.{TextExtract => TE}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NELL-995 triples source (nell995/FromText.kt:23–51): TSV lines
  * `concept_<label>_<entity> \t concept:<rel> \t concept_<label>_<entity>`.
  * Line scan → split → concept split with the reference's fallback
  * (label=raw, entity="gpslocation" on no-match, FromText.kt:14–21).
  * Emits entity triples plus CATEGORY label triples (the reference labels
  * each merged node with its concept label). */
object Nell {

  def fromText(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .filter(size(col("f")) >= 3)
      .select(
        TE.nellLabelEntity(col("f")(0)).as("from"),
        TE.nellRelation(col("f")(1)).as("rel"),
        TE.nellLabelEntity(col("f")(2)).as("to"))
    val rels = lines.select(
      col("from.entity").as("subj"), col("rel").as("pred"), col("to.entity").as("obj"))
    val labels = lines.select(col("from.entity").as("subj"),
        lit("category").as("pred"), col("from.label").as("obj"))
      .unionByName(lines.select(col("to.entity").as("subj"),
        lit("category").as("pred"), col("to.label").as("obj")))
    rels.unionByName(labels).distinct()
  }
}
