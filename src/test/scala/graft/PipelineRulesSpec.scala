package graft

import graft.core.Rules
import graft.stages.KbExpand
import org.scalatest.funsuite.AnyFunSuite

/** Per-pipeline rule tables (GovernmentGraph.kt:7–14, CompanyGraph.kt:9–20,
  * ReligionGraph.kt:21–37): a single-pipeline replay must recurse ONLY on
  * that pipeline's relations — the union (the default engine rule set) would
  * crawl further. */
class PipelineRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ment2ent = Seq(
    ("佛", Seq("佛教")), ("禅宗", Seq("禅宗")), ("达摩", Seq("达摩")),
    ("某公司", Seq("某公司")))
    .toDF("mention", "entities")

  private def avpair = Seq(
    ("佛教", "教派", "禅宗"),        // religion-recursive
    ("佛教", "面积", "3"),           // not recursive anywhere
    ("禅宗", "主要人物", "达摩"),    // religion-recursive
    ("达摩", "创办人", "某公司"),    // company-recursive, NOT religion
    ("某公司", "开发商", "别家"))
    .toDF("entity", "pred", "obj")

  test("religion pipeline closure stops at non-religion relations") {
    val mentions = Seq("佛").toDF("mention")
    val kb = KbExpand.expand(spark, mentions, ment2ent, avpair,
      Rules.religion.recursive)
    val subjects = kb.select("subj").as[String].collect().toSet
    assert(subjects === Set("佛教", "禅宗", "达摩")) // 某公司 NOT crawled
    // the union rule set (default engine behavior) crawls one hop further
    val kbUnion = KbExpand.expand(spark, mentions, ment2ent, avpair,
      Rules.recursivePreds)
    val subjectsUnion = kbUnion.select("subj").as[String].collect().toSet
    assert(subjectsUnion === Set("佛教", "禅宗", "达摩", "某公司"))
  }

  test("per-pipeline target-label rules, incl. the reference's literal-'relation' quirk") {
    assert(Rules.government.targetLabels(Set.empty, "机场") === Set("交通设施"))
    assert(Rules.government.targetLabels(Set.empty, "面积") === Set("面积"))
    assert(Rules.company.targetLabels(Set.empty, "创办人") === Set("经济人物"))
    assert(Rules.company.targetLabels(Set.empty, "开发商") === Set("公司"))
    assert(Rules.company.targetLabels(Set.empty, "面积") === Set("面积"))
    assert(Rules.religion.targetLabels(Set("宗教"), "别名") === Set("宗教"))
    assert(Rules.religion.targetLabels(Set("人物"), "别名") === Set("人物"))
    assert(Rules.religion.targetLabels(Set.empty, "主要人物") === Set("宗教人物"))
    // ReligionGraph.kt:36 returns the LITERAL "relation" on fallthrough
    assert(Rules.religion.targetLabels(Set.empty, "面积") === Set("relation"))
    // union of recursion sets = the engine default
    assert(Rules.pipelines.map(_.recursive).reduce(_ ++ _) === Rules.recursivePreds)
  }

  test("labelCol column rules agree with the targetLabels functions") {
    import org.apache.spark.sql.functions.col
    val preds = Seq("机场", "火车站", "现任领导", "创办人", "创始人", "开发商",
      "发行商", "主办单位", "开发公司", "教派", "学派", "所属宗教", "隶属",
      "主要人物", "别名", "俗称", "别称", "又名", "面积", "著名景点")
    val d = preds.flatMap(p => Seq((p, true), (p, false))).toDF("pred", "subj_rel")
    Rules.pipelines.foreach { pr =>
      d.select(col("pred"), col("subj_rel"),
          pr.labelCol(col("pred"), col("subj_rel")).as("label"))
        .as[(String, Boolean, String)].collect()
        .foreach { case (p, rel, label) =>
          val want = pr.targetLabels(if (rel) Set("宗教") else Set.empty, p)
          assert(want === Set(label), s"${pr.name}: pred=$p subjRel=$rel")
        }
    }
  }

  test("CrawlMain single-pipeline replay runs end-to-end with its own label rule") {
    import org.apache.spark.sql.functions.{col, explode}
    val cfg = graft.gen.Corpus.Config(nDocs = 150, nEntities = 60, seed = 42L)
    val (kbG, labelsG, _) = CrawlMain.run(spark, Rules.government, cfg)
    assert(kbG.count() > 0)
    val gLabels = labelsG.select(explode(col("labels")).as("l"))
      .as[String].collect().toSet
    // government fallthrough keeps the relation name — never the literal
    assert(!gLabels.contains("relation"))
    val (kbR, labelsR, canonR) = CrawlMain.run(spark, Rules.religion, cfg)
    assert(kbR.count() > 0)
    val rLabels = labelsR.select(explode(col("labels")).as("l"))
      .as[String].collect().toSet
    // religion's ReligionGraph.kt:36 quirk: fallthrough IS the literal
    assert(rLabels.contains("relation"))
    // canonical map shape: (name, comp), comp lexicographically ≤ name
    val canon = canonR.as[(String, String)].collect()
    assert(canon.forall { case (n, c) => c < n })
  }
}
