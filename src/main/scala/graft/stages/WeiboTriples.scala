package graft.stages

import graft.functions.{TextExtract => TE}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 2b — (subj, pred, obj) triples from normalized blog/comment rows.
  *
  * The triple vocabulary is the reference's graph-materialize relation set
  * (DumpGraphToText.kt:38–46: keyword/repost/comment/reference/create;
  * BlogTreeInNeo4j.kt:154–199), plus attribute triples for the counter /
  * time / name fields the reference lands in its MySQL tables
  * (FromScrappyDump.kt:392–403). Namespaces are prefixed (`blog:` …) so the
  * weibo id space can never collide with KB entity names during
  * canonicalization.
  *
  * All narrow projections + one explode; unions stay unshuffled until the
  * global triple dedup.
  */
object WeiboTriples {

  private def t(subj: org.apache.spark.sql.Column, pred: String,
                obj: org.apache.spark.sql.Column) = Seq(
    subj.as("subj"), lit(pred).as("pred"), obj.as("obj"),
    col("doc_id"), lit(0).as("span_offset"))

  def emit(blogs: DataFrame, comments: DataFrame): DataFrame = {
    val vb = blogs.filter(col("valid"))
    val blogId = concat(lit("blog:"), col("mid"))
    val userId = concat(lit("user:"), col("uid"))

    val create = vb.select(t(userId, "create", blogId): _*)
    val uname  = vb.select(t(userId, "name", col("username")): _*)
    val repost = vb.filter(col("repost_id").isNotNull)
      .select(t(concat(lit("blog:"), col("repost_id")), "repost", blogId): _*)
    val rootKw = vb.filter(col("keyword").isNotNull)
      .select(t(concat(lit("root:"), col("keyword")), "keyword", blogId): _*)
    val atTime = vb.select(t(blogId, "at_time", col("time")): _*)
    val counters = Seq(("repost", "repost_count"), ("comment", "comment_count"),
      ("like", "like_count")).map { case (c, pred) =>
      vb.select(t(blogId, pred, col(c).cast("string")): _*)
    }.reduce(_ unionByName _)
    // detectTags gated on content presence (FromScrappyDump.kt:236–239)
    val tags = vb.filter(col("content").isNotNull)
      .select(blogId.as("subj"), col("doc_id"), col("content_offset"),
        explode(TE.detectTags(col("content"))).as("tag"))
      .select(col("subj"), lit("reference").as("pred"),
        concat(lit("tag:"), col("tag")).as("obj"),
        col("doc_id"), col("content_offset").as("span_offset"))

    val vc = comments.filter(col("valid"))
    val cId = concat(lit("comment:"), col("cid"))
    val cUser = vc.select(t(concat(lit("user:"), col("uid")), "create", cId): _*)
    val cBlog = vc.select(t(cId, "comment", concat(lit("blog:"), col("mid"))): _*)
    val cLike = vc.select(t(cId, "like_count", col("like").cast("string")): _*)
    val cTime = vc.filter(col("time").isNotNull)
      .select(t(cId, "at_time", col("time")): _*)

    Seq(create, uname, repost, rootKw, atTime, counters, tags,
      cUser, cBlog, cLike, cTime).reduce(_ unionByName _)
  }
}
