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
  * SINGLE-PASS emission: each row emits one INDEX explode (0..7 = the
  * fixed triple slots, 8.. = one slot per detected tag) and the
  * (subj, pred, obj) columns are built AFTER the explode by codegen'd
  * when-chains over the slot index — scan → project → ONE Generate, and
  * not a 13-branch union that would re-read the docs 13 times. At 100 TB
  * the number of input scans is the cost model; this keeps it at one.
  *
  * Why an index explode and not an array-of-structs explode: the tag leg
  * needs a per-element rewrite, and the `transform` HOF is a
  * CodegenFallback — inside the whole-stage-codegen'd map pass its ENTIRE
  * subtree (detectTags' two regexp_extract_all walks + a struct allocation
  * per tag) re-ran INTERPRETED per blog row, measured as the
  * CreateNamedStruct.eval / getAccessor allocation storm in the stage-19
  * leaf profile. Exploding the cheap int sequence keeps every expression
  * (detectTags once per row, pre-explode; the slot when-chains post-
  * explode) inside codegen, and the Generate carries ints instead of
  * 8-struct unsafe arrays. Conditional triples (repost/keyword/missing
  * time) carry a null subj/obj exactly as before and are filtered after
  * the explode.
  */
object WeiboTriples {

  def emit(blogs: DataFrame, comments: DataFrame): DataFrame = {
    val b = {
      val blogId = concat(lit("blog:"), col("mid"))
      val userId = concat(lit("user:"), col("uid"))
      // detectTags gated on content presence (FromScrappyDump.kt:236–239)
      val tags = when(col("content").isNotNull, TE.detectTags(col("content")))
        .otherwise(lit(Array.empty[String]))
      val i = col("i")
      val subj =
        when(i <= 1, userId)
          .when(i === 6, concat(lit("blog:"), col("repost_id")))
          .when(i === 7, concat(lit("root:"), col("keyword")))
          .otherwise(blogId) // slots 2–5 and every tag slot
      val pred =
        when(i === 0, "create").when(i === 1, "name")
          .when(i === 2, "at_time").when(i === 3, "repost_count")
          .when(i === 4, "comment_count").when(i === 5, "like_count")
          .when(i === 6, "repost").when(i === 7, "keyword")
          .otherwise("reference")
      val obj =
        when(i === 0 || i >= 6, blogId) // create/repost/keyword all point at the blog
          .when(i === 1, col("username"))
          .when(i === 2, col("time"))
          .when(i === 3, col("repost").cast("string"))
          .when(i === 4, col("comment").cast("string"))
          .when(i === 5, col("like").cast("string"))
      val objWithTags = // tag slots: i ≥ 8 → tag:(tags[i−8]); in-range by construction
        when(i <= 7, obj).otherwise(concat(lit("tag:"), get(col("tags"), i - 8)))
      blogs.filter(col("valid"))
        .select(col("doc_id"), col("mid"), col("uid"), col("username"),
          col("time"), col("repost"), col("comment"), col("like"),
          col("repost_id"), col("keyword"), col("content_offset"),
          tags.as("tags"))
        .select(col("doc_id"), col("mid"), col("uid"), col("username"),
          col("time"), col("repost"), col("comment"), col("like"),
          col("repost_id"), col("keyword"), col("content_offset"), col("tags"),
          explode(sequence(lit(0), lit(7) + size(col("tags")))).as("i"))
        .select(subj.as("subj"), pred.as("pred"),
          objWithTags.cast("string").as("obj"), col("doc_id"),
          when(i >= 8, col("content_offset")).otherwise(lit(0))
            .cast("int").as("span_offset"))
        .filter(col("subj").isNotNull && col("obj").isNotNull)
    }

    val c = {
      val cId = concat(lit("comment:"), col("cid"))
      val i = col("i")
      val subj = when(i === 0, concat(lit("user:"), col("uid"))).otherwise(cId)
      val pred = when(i === 0, "create").when(i === 1, "comment")
        .when(i === 2, "like_count").otherwise("at_time")
      // obj null when the comment has no time (slot 3) → filtered below
      val obj = when(i === 0, cId)
        .when(i === 1, concat(lit("blog:"), col("mid")))
        .when(i === 2, col("like").cast("string"))
        .otherwise(col("time"))
      comments.filter(col("valid"))
        .select(col("doc_id"), col("cid"), col("uid"), col("mid"),
          col("like"), col("time"),
          explode(sequence(lit(0), lit(3))).as("i"))
        .select(subj.as("subj"), pred.as("pred"), obj.cast("string").as("obj"),
          col("doc_id"), lit(0).as("span_offset"))
        .filter(col("subj").isNotNull && col("obj").isNotNull)
    }

    b.unionByName(c)
  }
}
