package graft

import graft.stages.Linker
import org.scalatest.funsuite.AnyFunSuite

/** Entity-link scoring: the candidate whose KB profile shares the span's
  * context bigrams must rank first; scores are hand-computed. */
class LinkerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ambiguous mention ranks by context-bigram overlap, tie-break by entity") {
    // mention 北大 → {北京大学, 北大荒集团}; span context talks about 大学/学校
    val detected = Seq(("d0", 1, "这所大学的北大学生", "北大"))
      .toDF("doc_id", "span_offset", "text", "mention")
    val m2e = Seq(("北大", "北京大学"), ("北大", "北大荒集团"))
      .toDF("mention", "entity")
    val avpair = Seq(
      ("北京大学", "CATEGORY_ZH", "学校"), ("北京大学", "简介", "大学学生"),
      ("北大荒集团", "CATEGORY_ZH", "公司"), ("北大荒集团", "简介", "农垦集团"))
      .toDF("entity", "pred", "obj")
    val got = Linker.scoreCandidates(detected, m2e, Linker.entityProfiles(avpair))
      .as[(String, Int, String, String, Double, Int)].collect()
      .map(r => (r._4, r._5, r._6)).sortBy(_._3)
    // context bigrams (distinct, 9 chars → 8 bigrams): 这所 所大 大学 学的 的北 北大 大学(dup) 学生 → 7
    // 北京大学 profile: 学校 | 大学 学学 学生 → {学校,大学,学学,学生} = 4
    // overlap {大学, 学生} = 2 → 2 / (7 + 4 - 2) = 0.222222
    // 北大荒集团 profile: 公司 | 农垦 垦集 集团 = 4; overlap 0 → 0
    assert(got.length === 2)
    assert(got(0)._1 === "北京大学" && got(0)._3 === 1)
    assert(math.abs(got(0)._2 - 0.222222) < 1e-9)
    assert(got(1)._1 === "北大荒集团" && got(1)._2 === 0.0 && got(1)._3 === 2)
  }
}
