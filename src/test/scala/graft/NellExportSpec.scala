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
}
