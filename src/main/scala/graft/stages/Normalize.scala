package graft.stages

import graft.functions.{Base62, TextExtract => TE}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stage 1 — rectify interleaved docs into normalized blog / comment rows.
  *
  * The Spark image of the reference's per-row field rectification
  * (weibo/FromScrappyDump.kt:162–285 parseBlog, :295–348 parseComment,
  * version dispatch :376–383). Entirely narrow column expressions over the
  * `spans` array — no explode, no shuffle, whole-stage codegen; this stage
  * scales linearly and is the basis of the N→4N scaling evidence.
  */
object Normalize {

  /** Spans in offset order — the generator emits them ordered, but the
    * per-row invariant is on (kind, text, media_ref, ORDER), so sort
    * defensively. IMPORTANT: comparator-lambda array_sort is interpreted
    * (not codegen'd) — it must be materialized ONCE per row into a column
    * (see [[withSortedSpans]]), never embedded in every derived column, or
    * the sort re-evaluates ~15× per row and dominates the stage. */
  def spansSorted(c: Column): Column =
    array_sort(c, (l, r) => l.getField("offset") - r.getField("offset"))

  /** Rewrite `spans` to offset-sorted exactly once per row. */
  def withSortedSpans(docs: DataFrame): DataFrame =
    docs.withColumn("spans", spansSorted(col("spans")))

  private def firstOf(spans: Column, kind: String): Column =
    get(filter(spans, s => s.getField("kind") === kind), lit(0)) // null-safe under ANSI

  private def textOf(spans: Column, kind: String): Column =
    firstOf(spans, kind).getField("text")

  private def refOf(spans: Column, kind: String): Column =
    firstOf(spans, kind).getField("media_ref")

  /** Counter field by its CJK prefix word — the image of the reference's
    * per-field intOrZero (FromScrappyDump.kt:169–171, 340–344). */
  private def statOf(spans: Column, word: String): Column =
    TE.intOrZero(get(
      filter(spans, s => s.getField("kind") === "stat" &&
        s.getField("text").startsWith(word)), lit(0)).getField("text"))

  def isComment(spans: Column): Column =
    exists(spans, s => s.getField("kind") === "cid")

  /** docs → normalized blog rows (null mid / missing time ⇒ invalid, the
    * reference's `return false` paths, FromScrappyDump.kt:166, 179–182, 225). */
  def blogs(docs0: DataFrame): DataFrame = {
    val docs = withSortedSpans(docs0)
    val sp = col("spans")
    val url = refOf(sp, "link")
    val content = textOf(sp, "text")
    val unameRaw = textOf(sp, "uname")
    val ctime = textOf(sp, "ctime")
    val timeF = textOf(sp, "time")
    val scrap = textOf(sp, "scrap")
    val srcSpan = firstOf(sp, "src")
    val srcRef = srcSpan.getField("media_ref")
    val srcText = srcSpan.getField("text")

    // create_time branch then time branch (FromScrappyDump.kt:202–225)
    val timeClean = regexp_replace(timeF, "\n", "")
    val timeRaw =
      when(ctime.isNotNull,
        when(ctime.contains("<div"), trim(TE.titleAttr(ctime))).otherwise(ctime))
      .when(timeF.isNotNull,
        when(timeClean.contains("<a"), TE.anchorText(timeClean)).otherwise(trim(timeClean)))

    // username: nick-name markup | plain | unknown (FromScrappyDump.kt:186–196)
    val username =
      when(unameRaw.isNotNull,
        when(unameRaw.contains("<a "), TE.nickName(unameRaw)).otherwise(trim(unameRaw)))
      .otherwise(lit("unknown"))

    docs
      .filter(!isComment(sp))
      .select(
        col("doc_id"),
        TE.url2codedMid(url).as("mid"),
        TE.uidFromBlogUrl(url).as("uid"),
        content.as("content"),
        firstOf(sp, "text").getField("offset").as("content_offset"),
        username.as("username"),
        statOf(sp, "转发").as("repost"),
        statOf(sp, "评论").as("comment"),
        statOf(sp, "点赞").as("like"),
        timeRaw.as("time_raw"),
        scrap.as("scrap_time"),
        when(srcRef.contains("//weibo.com"), TE.url2codedMid(srcRef)).as("repost_id"),
        when(srcRef.contains("//weibo.com"), srcRef).as("repost_link"),
        when(srcRef.isNull, srcText).as("keyword"))
      .withColumn("time", TE.alignTime(col("scrap_time"), col("time_raw")))
      .withColumn("valid",
        col("mid").isNotNull && col("mid") =!= "" && col("time_raw").isNotNull)
      .withColumn("time_ok",
        TE.isValidTime(col("time")) || col("time") === "unknown")
  }

  /** docs → normalized comment rows (FromScrappyDump.kt:295–348). */
  def comments(docs0: DataFrame): DataFrame = {
    val docs = withSortedSpans(docs0)
    val sp = col("spans")
    val cidDec = textOf(sp, "cid")
    val ct = textOf(sp, "ctime")
    // startsWith "<div" → text between first '>' and next '<'; then strip
    // a leading `N楼 ` floor marker (FromScrappyDump.kt:308–316).
    val afterGt = get(split(ct, ">", 2), lit(1))
    val t0 = when(ct.startsWith("<div"), substring_index(afterGt, "<", 1)).otherwise(ct)
    // Kotlin substringAfter("楼 ") returns the original when the exact
    // delimiter (with the space) is absent
    val t1 = when(t0.contains("楼 "), get(split(t0, "楼 ", 2), lit(1))).otherwise(t0)

    docs
      .filter(isComment(sp))
      .select(
        col("doc_id"),
        Base62.encode_mid(cidDec).as("cid"),
        TE.uidFromUserUrl(refOf(sp, "user")).as("uid"),
        textOf(sp, "text").as("content"),
        firstOf(sp, "text").getField("offset").as("content_offset"),
        when(ct.isNull, lit(null).cast("string")).otherwise(t1).as("time"),
        textOf(sp, "scrap").as("scrap_time"),
        TE.url2codedMid(refOf(sp, "src")).as("mid"),
        statOf(sp, "赞").as("like"))
      .withColumn("valid", col("cid").isNotNull && col("mid") =!= "")
  }
}
