package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TransE/DeepPath text-export surface — the image of DumpGraphToText.kt:
  * integer-id triples, id dictionaries, 75/25 train/test split of forward
  * relations, tab-separated + JSON sinks.
  *
  * Determinism deltas from the reference (SURVEY.md §7.4): ids are assigned
  * by name order instead of arrival order, and the split is seeded instead
  * of `shuffled()` (DumpGraphToText.kt:298, 305–316) — the reference's
  * unseeded shuffle is why golden comparison is on sets, not file bytes.
  */
object Export {

  /** Fixed relation vocabulary + ids (DumpGraphToText.kt:38–46). */
  val relations: Seq[String] = Seq(
    "keyword", "keyword_inv", "repost", "repost_inv", "comment", "comment_inv",
    "reference", "reference_inv", "create", "create_inv",
    "entertainment", "entertainment_inv", "political", "political_inv")

  def relationIds(spark: SparkSession): DataFrame = {
    import spark.implicits._
    relations.zipWithIndex.toDF("rel", "rel_id")
  }

  /** Contiguous export ids, deterministic by name (buildEntityIndex image,
    * DumpGraphToText.kt:93–108). Export scale only — single window. */
  def entityIds(names: DataFrame): DataFrame =
    names.select(col("name")).distinct()
      .withColumn("ent_id", row_number().over(Window.orderBy("name")) - 1)

  /** Bidirectional integer triples (buildBidirection, DumpGraphToText.kt:
    * 116–119): each forward edge also emits obj→subj with `<rel>_inv`. */
  def integerGraph(spark: SparkSession, triples: DataFrame): DataFrame = {
    val base = triples.filter(col("pred").isin(
      "keyword", "repost", "comment", "reference", "create"))
    val both = base.select(col("subj"), col("pred"), col("obj"))
      .unionByName(base.select(col("obj").as("subj"),
        concat(col("pred"), lit("_inv")).as("pred"), col("subj").as("obj")))
    val ids = entityIds(
      both.select(col("subj").as("name")).union(both.select(col("obj").as("name"))))
    both
      .join(ids.withColumnRenamed("name", "subj").withColumnRenamed("ent_id", "from_id"), Seq("subj"))
      .join(ids.withColumnRenamed("name", "obj").withColumnRenamed("ent_id", "to_id"), Seq("obj"))
      .join(broadcast(relationIds(triples.sparkSession))
        .withColumnRenamed("rel", "pred"), Seq("pred"))
      .select("from_id", "to_id", "rel_id")
  }

  /** Forward-only 75/25 split (DumpGraphToText.kt:305–316; even rel ids are
    * the forward relations, :306), seeded for determinism. */
  def trainTestSplit(graph: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val fwd = graph.filter(col("rel_id") % 2 === 0)
    val Array(train, test) = fwd.randomSplit(Array(0.75, 0.25), seed)
    (train, test)
  }

  /** Write the five text sinks (S14/S15). coalesce(1): export scale only. */
  def writeAll(spark: SparkSession, triples: DataFrame, outDir: String): Unit = {
    val graph = integerGraph(spark, triples).cache()
    val names = triples.select(col("subj").as("name"))
      .union(triples.select(col("obj").as("name")))
    entityIds(names).coalesce(1)
      .write.mode("overwrite").option("sep", "\t").csv(s"$outDir/entity2id")
    relationIds(spark).coalesce(1)
      .write.mode("overwrite").option("sep", "\t").csv(s"$outDir/relation2id")
    graph.coalesce(1)
      .write.mode("overwrite").option("sep", "\t").csv(s"$outDir/train2id")
    val (train, test) = trainTestSplit(graph)
    train.coalesce(1).write.mode("overwrite").option("sep", "\t").csv(s"$outDir/train_pairs")
    test.coalesce(1).write.mode("overwrite").option("sep", "\t").csv(s"$outDir/test_pairs")
  }

  /** Episode export (G9, DumpGraphToText.kt:242–303): per qualifying root
    * (depth > 1, keyword in a topic table), all paths of exactly `depth`
    * hops with interleaved relation ids. */
  def episodes(blogEdges: DataFrame, rootsKw: DataFrame, labels: DataFrame,
               topicKeywords: Map[String, Seq[String]], depth: Int = 2): DataFrame = {
    val depths = TreeAnalytics.treeDepths(labels)
    val topics = topicKeywords.toSeq
      .flatMap { case (topic, kws) => kws.map(k => (k, topic)) }
    val spark = blogEdges.sparkSession
    import spark.implicits._
    val topicDf = broadcast(topics.toDF("keyword", "topic"))
    val valid = rootsKw.join(topicDf, Seq("keyword"))
      .join(depths.filter(col("depth") > 1)
        .withColumnRenamed("root", "mid"), Seq("mid"))
    val paths = TreeAnalytics.pathsAtDistance(blogEdges,
      valid.select(col("mid")), depth)
    paths.join(valid.select(col("mid").as("root"), col("topic")), Seq("root"))
      .select(col("topic"), col("steps"))
  }
}
