package graft.stages

import graft.functions.{TextExtract => TE}
import org.apache.spark.sql.{Column, DataFrame}
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
  * SINGLE-PASS emission: each row builds one array of triple structs
  * (conditional triples carry a null subj and are filtered after the
  * explode), so the whole stage is scan → project → ONE Generate — not a
  * 13-branch union that would re-read the docs 13 times. At 100 TB the
  * number of input scans is the cost model; this keeps it at one.
  */
object WeiboTriples {

  private def tr(subj: Column, pred: String, obj: Column,
                 off: Column): Column =
    struct(subj.as("subj"), lit(pred).as("pred"), obj.cast("string").as("obj"),
      col("doc_id").as("doc_id"), off.cast("int").as("span_offset"))

  def emit(blogs: DataFrame, comments: DataFrame): DataFrame = {
    val zero = lit(0)

    val b = {
      val blogId = concat(lit("blog:"), col("mid"))
      val userId = concat(lit("user:"), col("uid"))
      val fixed = array(
        tr(userId, "create", blogId, zero),
        tr(userId, "name", col("username"), zero),
        tr(blogId, "at_time", col("time"), zero),
        tr(blogId, "repost_count", col("repost"), zero),
        tr(blogId, "comment_count", col("comment"), zero),
        tr(blogId, "like_count", col("like"), zero),
        // null subj when not a repost / not a root → filtered below
        tr(concat(lit("blog:"), col("repost_id")), "repost", blogId, zero),
        tr(concat(lit("root:"), col("keyword")), "keyword", blogId, zero))
      // detectTags gated on content presence (FromScrappyDump.kt:236–239);
      // slice(fixed, 1, 0) = typed empty array of the same struct type
      val tags = when(col("content").isNotNull,
        transform(TE.detectTags(col("content")),
          t => tr(blogId, "reference", concat(lit("tag:"), t), col("content_offset"))))
        .otherwise(slice(fixed, 1, 0))
      blogs.filter(col("valid"))
        .select(col("doc_id"), explode(concat(fixed, tags)).as("t"))
        .select(col("t.subj"), col("t.pred"), col("t.obj"),
          col("t.doc_id"), col("t.span_offset"))
        .filter(col("subj").isNotNull && col("obj").isNotNull)
    }

    val c = {
      val cId = concat(lit("comment:"), col("cid"))
      val fixed = array(
        tr(concat(lit("user:"), col("uid")), "create", cId, zero),
        tr(cId, "comment", concat(lit("blog:"), col("mid")), zero),
        tr(cId, "like_count", col("like"), zero),
        // obj null when the comment has no time → filtered below
        tr(cId, "at_time", col("time"), zero))
      comments.filter(col("valid"))
        .select(col("doc_id"), explode(fixed).as("t"))
        .select(col("t.subj"), col("t.pred"), col("t.obj"),
          col("t.doc_id"), col("t.span_offset"))
        .filter(col("subj").isNotNull && col("obj").isNotNull)
    }

    b.unionByName(c)
  }
}
