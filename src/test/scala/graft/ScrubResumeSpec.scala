package graft

import graft.core.TableIO
import graft.datapipe.ScrubPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Resumability of the 100 TB scrub composition (LSH → verify → closure):
  * every stage snapshot-commits through TableIO, a killed run resumes from
  * the last committed stage, and — the expensive invariant — the
  * corpus-wide shingle/minhash candidate stage is NEVER recomputed on
  * resume (proven by tampering: a resumed run must consume the committed
  * candidate snapshot, so a tampered snapshot must change the output). */
class ScrubResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two near-dup pairs (differ in one trailing token) + two unrelated docs
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "pack my box with five dozen liquor jugs right now"),
    (4L, "pack my box with five dozen liquor jugs right here"),
    (5L, "completely unrelated text about spark catalyst planning"),
    (6L, "another disjoint document mentioning tungsten codegen only"))
    .toDF("doc_id", "text")

  private def keepSet(out: ScrubPipeline.Outputs): Set[(Long, Long)] =
    out.keepMap.as[(Long, Long)].collect().toSet

  test("staged scrub ≡ lazy dataflow, manifests carry per-stage row counts") {
    val dir = Files.createTempDirectory("scrubio").toString
    val io = new TableIO(spark, dir)
    val lazyOut = keepSet(ScrubPipeline.run(spark, docs, "doc_id", "text"))
    val staged = keepSet(ScrubPipeline.run(spark, docs, "doc_id", "text", Some(io)))
    assert(staged === lazyOut)
    assert(lazyOut.nonEmpty, "fixture should produce at least one dedup cluster")
    // both near-dup pairs cluster to their min id
    assert(lazyOut.contains((2L, 1L)) && lazyOut.contains((4L, 3L)))
    Seq("lsh_candidates", "jaccard_verified", "keep_map").foreach { st =>
      assert(io.hasCommitted(st), s"stage $st not committed")
      val m = io.manifest(st)
      assert(m.contains("\"row_count\"") && m.contains("per_partition"),
        s"manifest of $st missing lineage: $m")
    }
  }

  test("kill after candidates: resume consumes the committed snapshot, no recompute") {
    val dir = Files.createTempDirectory("scrubio2").toString
    val io1 = new TableIO(spark, dir)
    val full = keepSet(ScrubPipeline.run(spark, docs, "doc_id", "text", Some(io1)))
    assert(full.nonEmpty)

    // crash after the candidate commit: downstream snapshots gone
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$dir/jaccard_verified")).deleteRecursively()
    new Directory(new java.io.File(s"$dir/keep_map")).deleteRecursively()
    val io2 = new TableIO(spark, dir)
    assert(io2.hasCommitted("lsh_candidates"))
    val resumed = keepSet(ScrubPipeline.run(spark, docs, "doc_id", "text", Some(io2)))
    assert(resumed === full)
    // the candidate stage was NOT re-committed by the resume
    assert(io2.lastCommitted("lsh_candidates") === 0)

    // tamper-proof of snapshot consumption: commit an EMPTY candidate
    // snapshot, wipe downstream again, resume — the result must be empty,
    // which is only possible if the scrub read the committed snapshot
    // instead of recomputing candidates from the corpus
    io2.commit("lsh_candidates",
      spark.range(0).select(col("id").as("id1"), col("id").as("id2")))
    new Directory(new java.io.File(s"$dir/jaccard_verified")).deleteRecursively()
    new Directory(new java.io.File(s"$dir/keep_map")).deleteRecursively()
    val io3 = new TableIO(spark, dir)
    assert(io3.lastCommitted("lsh_candidates") === 1)
    val tampered = keepSet(ScrubPipeline.run(spark, docs, "doc_id", "text", Some(io3)))
    assert(tampered.isEmpty,
      "resume recomputed the candidate stage instead of reading its snapshot")
  }
}
