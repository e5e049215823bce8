package graft.gen

import graft.core.Schemas._
import graft.functions.Base62
import java.util.Random
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic corpus of interleaved text+media documents plus an
  * embedded KB — the test/bench input of the whole engine (FIXTURES.md §1–2;
  * BASELINE.json: "no external data").
  *
  * Shapes mirror the reference's semi-structured scrapy rows
  * (weibo/FromScrappyDump.kt:162–348) and its KB API payloads
  * (cndbpedia/APIRequestCache.kt:85–105). Every doc is a pure function of
  * (seed, index) so Spark can synthesize partitions in parallel with no
  * driver materialization, and the single-threaded oracle regenerates the
  * identical corpus.
  *
  * Span kinds:
  *   link  — blog URL `//weibo.com/<uid>/<mid9>` in media_ref (MicroBlog.kt:6)
  *   text  — content with @handles, #topics#, //@ chains, KB mentions
  *   uname — username, plain or nick-name="…" markup (FromScrappyDump.kt:186–191)
  *   stat  — counter text `转发 17376` (FromScrappyDump.kt:38, 74–85)
  *   ctime — create_time field: `<div…><a title="…">` markup or raw
  *   time  — time field: `<a …>… 转赞人数…</a>` markup or relative CJK time
  *   scrap — scrap timestamp `yyyy-MM-dd HH:mm:ss`
  *   src   — meta.user_data.keyword: repost URL in media_ref, or keyword text
  *   cid   — (comment docs) decimal comment id
  *   user  — (comment docs) user link `//weibo.com/u/<uid>` in media_ref
  *   media — opaque media attachment ref (not consumed by the KG path)
  */
object Corpus {

  case class Config(
      nDocs: Int = 1000,
      nEntities: Int = 120,
      nUsers: Int = 200,
      seed: Long = 42L,
      commentRatio: Double = 0.25,
      repostRatio: Double = 0.6,   // of blog docs
      hotRootRatio: Double = 0.5,  // of reposts point at the single hot root (skew)
      hotMentionProb: Double = 0.25,
      malformedRate: Double = 0.03)

  // -- KB ---------------------------------------------------------------------

  private val units = Vector(
    "北京", "上海", "宗教", "佛教", "大学", "铁路", "机场", "公司", "集团",
    "科技", "输入", "浏览", "搜索", "电子", "能源", "银行", "景点", "领导",
    "市长", "基金", "文化", "旅游", "政府", "藏传", "喇嘛", "研究")
  private val suffixes = Vector("集团", "有限公司", "研究院")
  private val labels = Vector("宗教", "人物", "公司", "交通设施", "城市", "学校")
  import graft.core.Rules.{aliasPreds, recursivePreds, categoryPred}
  private val plainPreds = Vector("面积", "人口", "成立时间", "官网", "简介")
  private val recursivePredsV = recursivePreds.toVector.sorted

  case class KB(entities: Vector[String], ment2ent: Vector[Ment2Ent],
                avpair: Vector[AvPair]) {
    lazy val mentions: Vector[String] = ment2ent.map(_.mention)
  }

  /** Entity names are built so some strictly contain others — feeding the
    * containment-alias canonicalization (Neo4jIdCache.kt:8–15 semantics). */
  def kb(cfg: Config): KB = {
    val rnd = new Random(cfg.seed * 7919 + 1)
    val names = ArrayBuffer[String]()
    val seen = scala.collection.mutable.HashSet[String]()
    while (names.size < cfg.nEntities) {
      val base = units(rnd.nextInt(units.size)) +
        (if (rnd.nextBoolean()) units(rnd.nextInt(units.size)) else "")
      val name =
        if (names.nonEmpty && rnd.nextDouble() < 0.25)
          names(rnd.nextInt(names.size)) + suffixes(rnd.nextInt(suffixes.size))
        else base
      if (!seen.contains(name)) { seen += name; names += name }
    }
    val entities = names.toVector

    val avpair = ArrayBuffer[AvPair]()
    entities.zipWithIndex.foreach { case (e, i) =>
      val r = new Random(cfg.seed ^ (i.toLong * 2654435761L))
      avpair += AvPair(e, categoryPred, labels(r.nextInt(labels.size)))
      val n = 2 + r.nextInt(4)
      (0 until n).foreach { _ =>
        if (r.nextDouble() < 0.5) {
          val pred = recursivePredsV(r.nextInt(recursivePredsV.size))
          val obj = entities(r.nextInt(entities.size))
          if (obj != e) avpair += AvPair(e, pred, obj)
        } else {
          val pred = plainPreds(r.nextInt(plainPreds.size))
          avpair += AvPair(e, pred, s"值${r.nextInt(1000)}")
        }
      }
    }

    // mention dictionary: the entity names themselves + short ambiguous forms
    val m2e = ArrayBuffer[Ment2Ent]()
    entities.zipWithIndex.foreach { case (e, i) =>
      if (i % 3 != 0) m2e += Ment2Ent(e, Vector(e))
    }
    val r2 = new Random(cfg.seed * 31 + 5)
    (0 until cfg.nEntities / 4).foreach { k =>
      val m = s"热词${k}"
      val es = Vector.fill(1 + r2.nextInt(2))(entities(r2.nextInt(entities.size))).distinct
      m2e += Ment2Ent(m, es)
    }
    KB(entities, m2e.toVector, avpair.toVector)
  }

  // -- docs -------------------------------------------------------------------

  private val keywords = Vector("香港", "国庆", "阅兵", "双11", "少年的你", "小丑",
    "易烊千玺", "上海 车祸", "天猫双11开幕盛典", "智利")
  private val usernames = Vector("张三", "李四", "加措上师-慈爱基金", "王五", "赵六")

  /** Deterministic 16-digit decimal mid for doc `i`, within the digit ranges
    * the reference codec round-trips losslessly (MicroBlog.kt:10–11, 67–71:
    * segment values must encode to widths 1/4/4). */
  def midDecimal(i: Long, salt: Int): String = {
    val r = new Random(i * 1000003L + salt)
    val s0 = 10 + ((i + salt) % 52)
    val s1 = 1000000 + (math.abs(r.nextInt()) % 8000000)
    val s2 = 1000000 + (i % 8000000)
    f"$s0%02d$s1%07d$s2%07d"
  }

  def codedMid(i: Long, salt: Int): String = Base62.encodeMid(midDecimal(i, salt))

  /** Doc i — pure function of (cfg.seed, i). */
  def doc(cfg: Config, kbv: KB, i: Long): Doc = {
    val r = new Random(cfg.seed ^ (i * 6364136223846793005L + 1442695040888963407L))
    val spans = ArrayBuffer[Span]()
    var off = 0
    def add(kind: String, text: String, ref: String): Unit = {
      spans += Span(kind, text, ref, off); off += 1
    }

    val malformed = r.nextDouble() < cfg.malformedRate
    val isComment = r.nextDouble() < cfg.commentRatio
    val uid = (100000 + r.nextInt(cfg.nUsers)).toString
    val scrap = f"2019-09-${1 + r.nextInt(28)}%02d ${r.nextInt(24)}%02d:${r.nextInt(60)}%02d:${r.nextInt(60)}%02d"

    def contentText(): String = {
      val sb = new StringBuilder
      val nm = 1 + r.nextInt(3)
      (0 until nm).foreach { _ =>
        val m =
          if (r.nextDouble() < cfg.hotMentionProb) kbv.mentions(0)
          else kbv.mentions(r.nextInt(kbv.mentions.size))
        sb.append("谈谈").append(m).append("的近况 ")
      }
      if (r.nextDouble() < 0.5) sb.append(s"@用户${r.nextInt(50)} ")
      if (r.nextDouble() < 0.5) sb.append(s"#话题${r.nextInt(30)}# 评论一下 ")
      if (r.nextDouble() < 0.3)
        sb.append(s"//@转发者${r.nextInt(20)}: 原文 #不算的话题${r.nextInt(9)}# @不算 内容")
      sb.toString
    }

    if (isComment) {
      // comment1 shape (FromScrappyDump.kt:295–348)
      val cidDec = midDecimal(i, 77)
      add("cid", cidDec, null)
      add("text", contentText(), null)
      add("user", null, s"//weibo.com/u/$uid")
      val parentBlog = i % math.max(1, (i / 2) + 1)
      add("src", null, s"//weibo.com/${100000 + (parentBlog % cfg.nUsers)}/${codedMid(parentBlog, 0)}")
      if (!malformed) {
        val t = r.nextInt(3) match {
          case 0 => f"2019-09-${1 + r.nextInt(28)}%02d ${r.nextInt(24)}%02d:${r.nextInt(60)}%02d"
          case 1 => s"<div class=\"c\">${r.nextInt(12) + 1}楼 2019-09-01 10:1${r.nextInt(9)}</div>"
          case 2 => s"${1 + r.nextInt(59)}分钟前"
        }
        add("ctime", t, null)
      }
      add("stat", s"赞 ${r.nextInt(500)}", null)
      add("scrap", scrap, null)
    } else {
      // repost/search1 blog shape (FromScrappyDump.kt:162–285)
      if (!malformed) add("link", s"看这里", s"//weibo.com/$uid/${codedMid(i, 0)}?type=comment")
      add("text", contentText(), null)
      val uname = usernames(r.nextInt(usernames.size)) + r.nextInt(100)
      if (r.nextBoolean())
        add("uname", s"""<a href="//weibo.com/$uid?refer_flag=1001030103_" class="name" target="_blank" nick-name="$uname" suda-data="key=tblog">$uname</a>""", null)
      else add("uname", s" $uname ", null)
      add("stat", s"转发 ${r.nextInt(20000)}", null)
      add("stat", s"评论 ${r.nextInt(5000)}", null)
      add("stat", s"点赞 ${r.nextInt(99999)}", null)
      // time: ctime-markup | ctime-raw | time-markup | time-relative | bad
      r.nextInt(6) match {
        case 0 => add("ctime", s"""<div class="WB_from S_txt2"><a title="2019-0${1 + r.nextInt(9)}-0${1 + r.nextInt(9)} 1${r.nextInt(9)}:4${r.nextInt(9)}">某日</a></div>""", null)
        case 1 => add("ctime", f"2019-08-${1 + r.nextInt(28)}%02d 0${r.nextInt(9)}:3${r.nextInt(9)}", null)
        case 2 => add("time", s"""<a href="//weibo.com/x" suda-data="key=tblog">0${1 + r.nextInt(8)}月2${r.nextInt(8)}日 2${r.nextInt(3)}:4${r.nextInt(9)} 转赞人数超过10万;</a>""", null)
        case 3 => add("time", s"${1 + r.nextInt(59)}分钟前 转赞人数超过10", null)
        case 4 => add("time", r.nextInt(4) match {
          case 0 => "刚刚"
          case 1 => s"${1 + r.nextInt(50)}秒前"
          case 2 => s"${1 + r.nextInt(23)}小时前"
          case 3 => s"今天 1${r.nextInt(9)}:2${r.nextInt(9)}"
        }, null)
        case 5 => add("time", if (malformed) "乱七八糟时间" else s"今天1${r.nextInt(9)}:0${r.nextInt(9)} 转赞人数超过10", null)
      }
      add("scrap", scrap, null)
      val isRepost = r.nextDouble() < cfg.repostRatio && i > 0
      if (isRepost) {
        val parent: Long =
          if (r.nextDouble() < cfg.hotRootRatio) 0L // hot root — planted skew
          else r.nextInt(i.toInt).toLong
        add("src", null, s"//weibo.com/${100000 + (parent % cfg.nUsers)}/${codedMid(parent, 0)}")
      } else {
        add("src", keywords(r.nextInt(keywords.size)), null)
      }
      if (r.nextDouble() < 0.2) add("media", "图片", s"https://img.example/${i}.jpg")
    }
    Doc(s"doc_$i", spans.toVector)
  }

  def docs(cfg: Config): Iterator[Doc] = {
    val kbv = kb(cfg)
    (0L until cfg.nDocs.toLong).iterator.map(doc(cfg, kbv, _))
  }
}
