package graft.stages

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** neo4j-admin-import CSV emission — the thin loader seam a user migrating
  * off the reference's live Neo4j sink (Neo4jGraph.kt:9–96's transactional
  * MERGE writer) still needs: the engine's deduplicated `vertices`/`edges`
  * tables rendered in the bulk-import contract
  * (https://neo4j.com/docs/operations-manual/current/tools/neo4j-admin/neo4j-admin-import/):
  *
  *   nodes:         :ID,name,:LABEL            (labels ';'-joined)
  *   relationships: :START_ID,:END_ID,:TYPE
  *
  * Layout at scale: ONE driver-written header file per entity plus
  * headerless data parts written in parallel — neo4j-admin takes
  * `--nodes=nodes_header.csv,nodes/part-.*` so a 1000-executor export
  * never funnels through a single CSV writer and never repeats the header
  * per part. Quoting/escaping is Spark's CSV writer (RFC-4180 quotes when
  * a value contains the delimiter/quote/newline), which the importer
  * accepts as its default input dialect.
  */
object Neo4jExport {

  val NodeHeader = ":ID,name,:LABEL"
  val RelHeader = ":START_ID,:END_ID,:TYPE"

  /** (vertex_id, name, labels) → import-shaped node rows. */
  def nodeRows(vertices: DataFrame): DataFrame =
    vertices.select(col("vertex_id").cast("string").as(":ID"),
      col("name"), array_join(col("labels"), ";").as(":LABEL"))

  /** (src, dst, rel) → import-shaped relationship rows. */
  def relRows(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("string").as(":START_ID"),
      col("dst").cast("string").as(":END_ID"), col("rel").as(":TYPE"))

  /** Write the import bundle under `dir`:
    * `nodes_header.csv` + `nodes/part-*` and `relationships_header.csv` +
    * `relationships/part-*`. Import with
    * {{{
    * neo4j-admin database import full \
    *   --nodes=nodes_header.csv,nodes/part-.* \
    *   --relationships=relationships_header.csv,relationships/part-.* <db>
    * }}} */
  def write(vertices: DataFrame, edges: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/nodes_header.csv"), NodeHeader + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/relationships_header.csv"),
      RelHeader + "\n")
    nodeRows(vertices).write.mode("overwrite")
      .option("header", "false").option("emptyValue", "")
      .csv(s"$dir/nodes")
    relRows(edges).write.mode("overwrite")
      .option("header", "false").option("emptyValue", "")
      .csv(s"$dir/relationships")
  }
}
