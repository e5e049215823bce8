package graft.oracle

import graft.gen.{Corpus, CorpusData}
import graft.stages.Normalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materializes the seeded KG corpus as flat parquet so the driver's DuckDB
  * oracle can recompute the KG/tree queries independently (VERDICT r1 §next
  * item 1b). Written by [[graft.Verify]] before the query dump; the oracle
  * SQL in [[KgOracleSql]] reads these files via read_parquet('<abs path>').
  *
  * Raw corpus tables (pure generator output): oi_spans, oi_ment2ent,
  * oi_avpair. Derived tables (engine-normalized rows — field rectification
  * itself is verified by the golden suite + ExtractSpec golden vectors;
  * these let the oracle verify everything DOWNSTREAM of normalization:
  * triple emission, KB BFS closure, canonicalization, dedup, trees,
  * episodes, tree-graph): oi_blogs, oi_comments, oi_blog_edges.
  */
object OracleInputs {

  /** Absolute path — Verify and the driver's DuckDB run on the same host
    * with cwd = repo root. */
  def dir: String = new java.io.File("target/oracle-input").getAbsolutePath

  /** read_parquet() fragment for table `name`. */
  def rp(name: String): String = s"read_parquet('$dir/$name/*.parquet')"

  def blogCols: Seq[String] = Seq(
    "doc_id", "mid", "uid", "username", "content", "content_offset",
    "repost", "comment", "like", "time", "repost_id", "keyword")

  def commentCols: Seq[String] = Seq(
    "doc_id", "cid", "uid", "mid", "content", "content_offset", "time", "like")

  def materialize(spark: SparkSession, cfg: Corpus.Config): Unit = {
    def write(name: String, df: DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")

    val docs = CorpusData.docsDF(spark, cfg)
    write("oi_spans", docs
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.offset").as("offset")))
    write("oi_ment2ent", CorpusData.ment2entDF(spark, cfg)
      .select(col("mention"), explode(col("entities")).as("entity")))
    write("oi_avpair", CorpusData.avpairDF(spark, cfg))

    val blogs = Normalize.blogs(docs).filter(col("valid"))
      .select(blogCols.map(col): _*)
    write("oi_blogs", blogs)
    write("oi_comments", Normalize.comments(docs).filter(col("valid"))
      .select(commentCols.map(col): _*))
    write("oi_blog_edges", blogs.select("mid", "repost_id"))
  }
}
