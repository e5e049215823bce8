package graft

import graft.functions.SpanFields
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the one-pass span-field extraction (the normalize
  * stage's hot path): min-offset-per-kind selection, prefix-matched stats,
  * comment marker, null tolerance — independent of span array order. */
class SpanFieldsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val spanType = ArrayType(StructType(Seq(
    StructField("kind", StringType), StructField("text", StringType),
    StructField("media_ref", StringType), StructField("offset", IntegerType))))

  private def df(spans: Seq[(String, String, String, Integer)]) = {
    val schema = StructType(Seq(StructField("spans", spanType)))
    spark.createDataFrame(
      java.util.List.of(Row(spans.map(s => Row(s._1, s._2, s._3, s._4)))),
      schema)
  }

  private def sf(spans: Seq[(String, String, String, Integer)]): Row =
    df(spans).select(SpanFields(col("spans")).as("sf")).select("sf.*").collect()(0)

  test("min-offset span wins per kind, regardless of array order") {
    val r = sf(Seq(
      ("text", "later", null, 5),
      ("text", "first", null, 1),
      ("link", null, "//weibo.com/u1/AbCdEfGh1", 0)))
    assert(r.getAs[String]("text_text") === "first")
    assert(r.getAs[Int]("text_off") === 1)
    assert(r.getAs[String]("link_ref") === "//weibo.com/u1/AbCdEfGh1")
  }

  test("missing kinds surface as nulls; is_comment reflects a cid span") {
    val r = sf(Seq(("text", "t", null, 0)))
    assert(r.getAs[String]("uname_text") === null)
    assert(r.getAs[Any]("src_off") === null)
    assert(r.getAs[Boolean]("is_comment") === false)
    val c = sf(Seq(("cid", "4521052043629447", null, 0)))
    assert(c.getAs[Boolean]("is_comment") === true)
    assert(c.getAs[String]("cid_text") === "4521052043629447")
  }

  test("stat counters match by CJK prefix at min offset; 点赞 never leaks into 赞") {
    val r = sf(Seq(
      ("stat", "转发 99", null, 3),
      ("stat", "转发 11", null, 1),
      ("stat", "点赞 7", null, 2),
      ("stat", "赞 5", null, 4)))
    assert(r.getAs[String](SpanFields.statField("转发")) === "转发 11")
    assert(r.getAs[String](SpanFields.statField("点赞")) === "点赞 7")
    assert(r.getAs[String](SpanFields.statField("赞")) === "赞 5")
    assert(r.getAs[String](SpanFields.statField("评论")) === null)
  }

  test("null span elements, null kinds and null offsets don't crash the pass") {
    val r = sf(Seq(
      (null, "x", null, 0),
      ("text", "ok", null, null.asInstanceOf[Integer])))
    assert(r.getAs[String]("text_text") === "ok")
  }

  test("a winning span with null offset surfaces *_off as NULL, not a sentinel") {
    // regression (review finding): the sentinel Int.MaxValue-1 used for
    // ORDERING must never LEAK into the output offset
    val r = sf(Seq(("text", "only", null, null.asInstanceOf[Integer])))
    assert(r.getAs[String]("text_text") === "only")
    assert(r.getAs[Any]("text_off") === null)
    // null offsets order LAST: a real-offset span still wins
    val r2 = sf(Seq(
      ("text", "nulloff", null, null.asInstanceOf[Integer]),
      ("text", "real", null, 7)))
    assert(r2.getAs[String]("text_text") === "real")
    assert(r2.getAs[Int]("text_off") === 7)
  }

  test("parity with the higher-order formulation on a fuzzed batch") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val kinds = Seq("text", "link", "uname", "ctime", "time", "scrap", "src", "stat")
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(8)
      (0 until n).map { j =>
        val k = kinds(rnd.nextInt(kinds.length))
        val t = if (k == "stat") s"转发 ${rnd.nextInt(100)}" else s"v$j"
        // at most one null offset per row (j == 0) — nulls order LAST and a
        // second same-kind null-offset span would make the oracle's
        // (unstable) sort ambiguous
        val off = if (j == 0 && rnd.nextInt(3) == 0) null
          else Integer.valueOf(rnd.nextInt(10))
        (k, t, s"r$j", off)
      }
    }
    val schema = StructType(Seq(StructField("spans", spanType)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(s => Row(s.map(x => Row(x._1, x._2, x._3, x._4))))),
      schema)
    val viaSf = d.select(SpanFields(col("spans")).as("sf"))
      .select(col("sf.text_text"), col("sf.src_ref"),
        col(s"sf.${SpanFields.statField("转发")}"))
    val sorted = Normalize_sortedFirst(d)
    assert(viaSf.collect().toSeq.map(_.toSeq) === sorted.collect().toSeq.map(_.toSeq))
  }

  test("trie matchesArray ≡ String-path matches across UTF-8 widths (incl. surrogates)") {
    import graft.stages.Mentions
    import org.apache.spark.unsafe.types.UTF8String
    val dict = Seq("佛教", "道教", "ascii", "mix佛x", "🎉party", "z")
    val trie = Mentions.buildTrie(dict)
    val texts = Seq(
      "谈谈佛教与道教的区别",                    // 3-byte CJK
      "plain ascii text with z",                  // 1-byte
      "ümlaut és café mix佛x done",               // 2-byte + mixed
      "big 🎉party emoji 🎉 again",               // 4-byte surrogate pair
      "佛", "", "🎉", "zzz佛教z")
    texts.foreach { t =>
      val viaArray = trie.matchesArray(UTF8String.fromString(t))
      val got = (0 until viaArray.numElements())
        .map(i => viaArray.getUTF8String(i).toString).toSet
      assert(got === trie.matches(t), s"diverged on '$t'")
    }
    // thread-local scratch survives growth: a text longer than the initial
    // 256-char buffer decodes correctly
    val long = ("佛教" * 300) + " 🎉party tail z"
    val big = trie.matchesArray(UTF8String.fromString(long))
    val gotBig = (0 until big.numElements())
      .map(i => big.getUTF8String(i).toString).toSet
    assert(gotBig === trie.matches(long))
  }

  /** the old HOF formulation, kept here as the parity oracle (null offsets
    * sort last, mirroring the engine's ordering rule) */
  private def Normalize_sortedFirst(d: org.apache.spark.sql.DataFrame) = {
    val sp = array_sort(col("spans"), (l, r) =>
      coalesce(l.getField("offset"), lit(Int.MaxValue - 1)) -
        coalesce(r.getField("offset"), lit(Int.MaxValue - 1)))
    def firstOf(kind: String) =
      get(filter(sp, s => s.getField("kind") === kind), lit(0))
    d.select(
      firstOf("text").getField("text"),
      firstOf("src").getField("media_ref"),
      get(filter(sp, s => s.getField("kind") === "stat" &&
        s.getField("text").startsWith("转发")), lit(0)).getField("text"))
  }
}
