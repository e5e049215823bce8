package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Relation rule tables — per-pipeline rule sets plus their union.
  *
  * The default engine path uses the UNION of the three crawl pipelines'
  * rules (the golden P/R gate runs on the union); [[government]],
  * [[company]] and [[religion]] expose each pipeline's own recursion and
  * target-label rules so a single-pipeline replay matches the reference run
  * (GovernmentGraph.kt:7–14, CompanyGraph.kt:9–20, ReligionGraph.kt:21–37).
  */
object Rules {
  val categoryPred = "CATEGORY_ZH"
  val aliasPreds: Set[String] = Set("别名", "俗称", "别称", "又名")
  val recursivePreds: Set[String] = Set(
    "著名景点", "机场", "火车站", "现任领导", "现任市长",
    "创办人", "创始人", "开发商", "发行商", "主办单位", "开发公司",
    "教派", "学派", "主要人物", "所属宗教", "隶属") ++ aliasPreds

  /** One crawl pipeline's rule table: which relations recurse, and which
    * label(s) the relation assigns to its TARGET node. `targetLabels` takes
    * the SUBJECT's label set (the reference passes the crawled entity's
    * labels — AbstractSubjectGraph.kt:30). */
  final case class PipelineRules(
      name: String,
      recursive: Set[String],
      targetLabels: (Set[String], String) => Set[String],
      /** The same rule as a column expression for the DATAFLOW path:
        * (pred, subjIsReligion) → label. Must agree with `targetLabels`
        * (asserted in PipelineRulesSpec). */
      labelCol: (Column, Column) => Column)

  /** GovernmentGraph.kt:7–14. */
  val government: PipelineRules = PipelineRules(
    "government",
    Set("著名景点", "机场", "火车站", "现任领导", "现任市长"),
    (_, relation) => relation match {
      case "机场" | "火车站" => Set("交通设施")
      case r => Set(r)
    },
    (pred, _) => when(pred.isin("机场", "火车站"), lit("交通设施")).otherwise(pred))

  /** CompanyGraph.kt:9–20. */
  val company: PipelineRules = PipelineRules(
    "company",
    Set("创办人", "创始人", "开发商", "发行商", "主办单位", "开发公司"),
    (_, relation) => relation match {
      case "创办人" | "创始人" => Set("经济人物")
      case "开发商" | "发行商" | "主办单位" | "开发公司" => Set("公司")
      case r => Set(r)
    },
    (pred, _) => when(pred.isin("创办人", "创始人"), lit("经济人物"))
      .when(pred.isin("开发商", "发行商", "主办单位", "开发公司"), lit("公司"))
      .otherwise(pred))

  /** ReligionGraph.kt:21–37. NOTE the reference's else-branch returns the
    * LITERAL string "relation" (ReligionGraph.kt:36) — not the relation
    * name; reproduced faithfully here, while the engine's union rule keeps
    * the Government/Company behavior (label = relation name). */
  val religion: PipelineRules = PipelineRules(
    "religion",
    Set("教派", "学派", "主要人物", "所属宗教", "隶属") ++ aliasPreds,
    (labels, relation) => relation match {
      case "教派" | "学派" | "所属宗教" | "隶属" => Set("宗教")
      case "主要人物" => Set("宗教人物")
      case r if aliasPreds.contains(r) =>
        if (labels.contains("宗教")) Set("宗教") else Set("人物")
      case _ => Set("relation")
    },
    (pred, subjRel) => when(pred.isin("教派", "学派", "所属宗教", "隶属"), lit("宗教"))
      .when(pred === "主要人物", lit("宗教人物"))
      .when(pred.isin(aliasPreds.toSeq: _*),
        when(subjRel, lit("宗教")).otherwise(lit("人物")))
      .otherwise(lit("relation")))

  val pipelines: Seq[PipelineRules] = Seq(government, company, religion)

  /** DumpGraphToText.kt:48–71 — the reference's shipped topic keyword
    * tables (the 19-keyword episode/analyze classification). */
  val entertainmentKeywords: Set[String] = Set(
    "易烊千玺", "江一燕", "贾玲 情商", "雪莉", "胡歌 刘涛",
    "少年的你", "小丑", "#高颜值侧脸照大赛#", "双11", "天猫双11开幕盛典")
  val politicalKeywords: Set[String] = Set(
    "10岁女孩被杀", "上海 车祸", "香港", "国庆", "阅兵",
    "李心草", "智利", "朝鲜 火箭炮", "未成年人保护法")
  val topicKeywords: Map[String, Seq[String]] = Map(
    "entertainment" -> entertainmentKeywords.toSeq.sorted,
    "political" -> politicalKeywords.toSeq.sorted)
}
