package graft.core

/** Relation rule tables — the union of the reference's crawl-pipeline rules.
  * GovernmentGraph.kt:12–14, CompanyGraph.kt:15–20, ReligionGraph.kt:10–16;
  * category predicate AbstractSubjectGraph.kt:8. */
object Rules {
  val categoryPred = "CATEGORY_ZH"
  val aliasPreds: Set[String] = Set("别名", "俗称", "别称", "又名")
  val recursivePreds: Set[String] = Set(
    "著名景点", "机场", "火车站", "现任领导", "现任市长",
    "创办人", "创始人", "开发商", "发行商", "主办单位", "开发公司",
    "教派", "学派", "主要人物", "所属宗教", "隶属") ++ aliasPreds
}
