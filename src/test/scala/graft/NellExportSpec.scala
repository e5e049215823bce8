package graft

import graft.sources.Nell
import graft.stages.Export
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** NELL-995 text source (FromText.kt semantics incl. fallback) and the
  * TransE/DeepPath export surface (DumpGraphToText.kt image). */
class NellExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NELL TSV → triples with concept split + gpslocation fallback") {
    val dir = Files.createTempDirectory("nell").toFile
    val f = new java.io.File(dir, "graph.txt")
    Files.writeString(f.toPath,
      "concept_athlete_michael_jordan\tconcept:athleteplaysforteam\tconcept_sportsteam_chicago_bulls\n" +
      "concept_city_beijing\tconcept:citylocatedincountry\tconcept_country_china\n" +
      "point_4412_912\tconcept:nearby\tconcept_city_beijing\n") // malformed head → fallback
    val t = Nell.fromText(spark, f.getAbsolutePath)
      .as[(String, String, String)].collect().toSet
    assert(t.contains(("michael_jordan", "athleteplaysforteam", "chicago_bulls")))
    assert(t.contains(("michael_jordan", "category", "athlete")))
    assert(t.contains(("chicago_bulls", "category", "sportsteam")))
    // FromText.kt:14–21 fallback: label = raw string, entity = "gpslocation"
    assert(t.contains(("gpslocation", "nearby", "beijing")))
    assert(t.contains(("gpslocation", "category", "point_4412_912")))
  }

  test("integer graph export: bidirectional rel ids, deterministic entity ids") {
    val triples = Seq(
      ("user:u1", "create", "blog:b1", "d0", 0),
      ("blog:b1", "repost", "blog:b2", "d1", 0),
      ("root:kw", "keyword", "blog:b1", "d2", 0))
      .toDF("subj", "pred", "obj", "doc_id", "span_offset")
    val g = Export.integerGraph(spark, triples)
      .as[(Int, Int, Int)].collect().toSet
    assert(g.size === 6) // 3 forward + 3 inverse
    // inverse pairs: rel_id of X_inv = rel_id(X) + 1 (DumpGraphToText.kt:38–46)
    val fwd = g.filter(_._3 % 2 == 0)
    assert(fwd.forall { case (a, b, r) => g.contains((b, a, r + 1)) })
    // ids contiguous 0..n-1 by name order
    val ids = g.flatMap(t => Seq(t._1, t._2))
    assert(ids === (0 until ids.size).toSet)
  }

  test("75/25 seeded split over forward relations only (DumpGraphToText.kt:305–316)") {
    val triples = (0 until 400).map(i =>
      (s"user:u$i", "create", s"blog:b$i", "d", 0))
      .toDF("subj", "pred", "obj", "doc_id", "span_offset")
    val g = Export.integerGraph(spark, triples).cache()
    val (train, test) = Export.trainTestSplit(g, seed = 42L)
    assert(train.filter(col("rel_id") % 2 =!= 0).count() === 0)
    assert(test.filter(col("rel_id") % 2 =!= 0).count() === 0)
    val (n1, n2) = (train.count(), test.count())
    assert(n1 + n2 === 400)
    assert(n1 > 250 && n1 < 350) // ~75%
    // seeded determinism
    val (train2, _) = Export.trainTestSplit(g, seed = 42L)
    assert(train2.count() === n1)
  }

  test("episode export: qualifying roots only, paths at exact depth (G9)") {
    import graft.stages.TreeAnalytics
    // r1 (keyword 香港, depth 2) qualifies; r2 (depth 1) and r3 (unknown kw) don't
    val edges = Seq(
      ("r1", null.asInstanceOf[String]), ("a", "r1"), ("c", "a"),
      ("r2", null.asInstanceOf[String]), ("b", "r2"),
      ("r3", null.asInstanceOf[String]), ("d", "r3"), ("e", "d"))
      .toDF("mid", "repost_id")
    val rootsKw = Seq(("r1", "香港"), ("r2", "香港"), ("r3", "没见过的词"))
      .toDF("mid", "keyword")
    val labels = TreeAnalytics.rootsAndLevels(edges)
    val eps = Export.episodes(edges, rootsKw, labels,
      Map("political" -> Seq("香港", "国庆"), "entertainment" -> Seq("双11")),
      depth = 2)
      .as[(String, String)].collect().toSet
    assert(eps === Set(("political", "r1, a, c")))
  }

  test("episodesFull: interleaved (id, rel-id, id) arrays + analyze pairs (G9)") {
    import graft.stages.TreeAnalytics
    // r1 (political keyword 香港, tree depth 2) qualifies → one path r1,a,c;
    // r2 (depth 1) and r3 (keyword outside the shipped tables) don't
    val edges = Seq(
      ("r1", null.asInstanceOf[String]), ("a", "r1"), ("c", "a"), ("b", "r1"),
      ("r2", null.asInstanceOf[String]), ("b2", "r2"),
      ("r3", null.asInstanceOf[String]), ("d", "r3"), ("e", "d"))
      .toDF("mid", "repost_id")
    val rootsKw = Seq(("r1", "香港"), ("r2", "香港"), ("r3", "没见过的词"))
      .toDF("mid", "keyword")
    val ids = Seq(("blog:r1", 5), ("blog:a", 1), ("blog:c", 3), ("blog:b", 7))
      .toDF("name", "ent_id")
    val labels = TreeAnalytics.rootsAndLevels(edges)
    val eps = Export.episodesFull(edges, rootsKw, labels, ids)
    val rows = eps.as[(Int, Int, Int, String)].collect().toSet
    // interleaved with repost rel id 2; political rid = 12
    assert(rows === Set((5, 3, 12, "5,2,1,2,3")))
    val analyze = Export.analyzeGraph(eps)
      .as[(Int, Int, Int)].collect().toSet
    assert(analyze === Set((5, 3, 12), (3, 5, 13))) // forward + _inv
  }

  test("staging last-write-wins + flatten (WeiboManager.kt semantics)") {
    import graft.stages.Staging
    val rows = Seq((1L, "k1", "v1"), (2L, "k2", "v2"), (3L, "k1", "v3"))
      .toDF("seq", "key", "value")
    val lww = Staging.lastWriteWins(rows, Seq("key"), "seq")
      .as[(Long, String, String)].collect().toSet
    assert(lww === Set((3L, "k1", "v3"), (2L, "k2", "v2")))
    val flat = Staging.flatten(
      Seq(("k1", Seq(1, 2)), ("k2", Seq(3))).toDF("key", "vals"),
      "key", "vals", "tid").as[(String, Int)].collect().toSet
    assert(flat === Set(("k1", 1), ("k1", 2), ("k2", 3)))
  }

  test("writeAll lands the five text sinks") {
    val out = Files.createTempDirectory("export").toString
    val triples = Seq(
      ("user:u1", "create", "blog:b1", "d0", 0),
      ("blog:b1", "repost", "blog:b2", "d1", 0))
      .toDF("subj", "pred", "obj", "doc_id", "span_offset")
    Export.writeAll(spark, triples, out)
    for (d <- Seq("entity2id", "relation2id", "train2id", "train_pairs", "test_pairs"))
      assert(new java.io.File(s"$out/$d").exists(), d)
    assert(spark.read.option("sep", "\t").csv(s"$out/relation2id").count() === 14)
  }

  test("writeAllWithEpisodes lands episodes.json + analyze-set pairs") {
    import graft.stages.TreeAnalytics
    val out = Files.createTempDirectory("export-ep").toString
    val edges = Seq(
      ("r1", null.asInstanceOf[String]), ("a", "r1"), ("c", "a"))
      .toDF("mid", "repost_id")
    val rootsKw = Seq(("r1", "香港")).toDF("mid", "keyword")
    val triples = Seq(
      ("root:香港", "keyword", "blog:r1", "d0", 0),
      ("blog:r1", "repost", "blog:a", "d1", 0),
      ("blog:a", "repost", "blog:c", "d2", 0))
      .toDF("subj", "pred", "obj", "doc_id", "span_offset")
    Export.writeAllWithEpisodes(spark, triples, edges, rootsKw,
      TreeAnalytics.rootsAndLevels(edges), out)
    val eps = spark.read.json(s"$out/episodes")
    assert(eps.count() === 1)
    val row = eps.select("from_id", "to_id", "rid", "paths")
      .as[(Long, Long, Long, Seq[Seq[Long]])].collect().head
    assert(row._3 === 12) // political
    assert(row._4.length === 1) // one path list per episode row
    assert(row._4.head.length === 5) // id, rel, id, rel, id interleave
  }

  test("neo4j-admin import bundle: header contract, ';' labels, RFC-4180 quoting") {
    import graft.stages.Neo4jExport
    val out = java.nio.file.Files.createTempDirectory("neo4j-csv").toString
    val vertices = Seq(
      (1L, "plain", Seq("Person")),
      (2L, "with,comma", Seq("Person", "Author")), // must be quoted
      (3L, "empty-labels", Seq.empty[String]))
      .toDF("vertex_id", "name", "labels")
    val edges = Seq((1L, 2L, "KNOWS"), (2L, 3L, "WROTE"))
      .toDF("src", "dst", "rel")
    Neo4jExport.write(vertices, edges, out)
    // header files: exactly the import-tool contract
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/nodes_header.csv")) === ":ID,name,:LABEL\n")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/relationships_header.csv")) === ":START_ID,:END_ID,:TYPE\n")
    val nodeLines = spark.read.text(s"$out/nodes")
      .as[String].collect().sorted.toSeq
    assert(nodeLines === Seq(
      "1,plain,Person",
      "2,\"with,comma\",Person;Author",
      "3,empty-labels,"))
    val relLines = spark.read.text(s"$out/relationships")
      .as[String].collect().sorted.toSeq
    assert(relLines === Seq("1,2,KNOWS", "2,3,WROTE"))
  }
}
