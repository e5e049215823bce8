package graft

import graft.gen.{Corpus, CorpusData}
import graft.oracle.RefOracle
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The P/R ≥ 0.95 gate (BASELINE.md): the Spark pipeline's distinct
  * (subj, pred, obj) set vs the single-threaded reference-semantics oracle,
  * on the seeded synthetic interleaved-docs corpus. Also checks the
  * input_hint per-row invariant: span-sequence equality on
  * (kind, text, media_ref, order) through the explode/normalize round-trip. */
class GoldenTripleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = Corpus.Config(nDocs = 1500, nEntities = 120, seed = 42L)

  test("golden triple P/R >= 0.95 vs reference oracle (t1)") {
    val docs = CorpusData.docsDF(spark, cfg)
    val out = KgPipeline.run(spark, docs,
      CorpusData.ment2entDF(spark, cfg), CorpusData.avpairDF(spark, cfg),
      shufflePartitions = 4)
    val emitted = out.triples.select("subj", "pred", "obj")
      .as[(String, String, String)].collect().toSet
    val golden = RefOracle.goldenTriples(cfg)

    val tp = (emitted intersect golden).size.toDouble
    val precision = tp / emitted.size
    val recall = tp / golden.size
    info(f"emitted=${emitted.size} golden=${golden.size} P=$precision%.4f R=$recall%.4f")
    if (precision < 1.0) {
      info("sample false-positives: " + (emitted diff golden).take(5).mkString("; "))
    }
    if (recall < 1.0) {
      info("sample false-negatives: " + (golden diff emitted).take(5).mkString("; "))
    }
    assert(precision >= 0.95, s"precision $precision below gate")
    assert(recall >= 0.95, s"recall $recall below gate")
  }

  test("per-row span-sequence invariant (kind, text, media_ref, order)") {
    val docs = CorpusData.docsDF(spark, cfg.copy(nDocs = 300))
    // explode and re-assemble ordered by offset; compare to the input rows
    val reassembled = docs
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "s")))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s.offset"), col("s.kind"),
        col("s.text"), col("s.media_ref")))).as("seq"))
    val original = docs.select(col("doc_id"),
      sort_array(expr("transform(spans, s -> struct(s.offset, s.kind, s.text, s.media_ref))")).as("seq"))
    assert(reassembled.join(original, Seq("doc_id"))
      .filter(reassembled("seq") =!= original("seq")).count() === 0)
    assert(original.count() === 300)
  }

  test("vertices/edges: stable ids, set-semantic labels, deduped edges") {
    val docs = CorpusData.docsDF(spark, cfg.copy(nDocs = 400))
    val out = KgPipeline.run(spark, docs,
      CorpusData.ment2entDF(spark, cfg), CorpusData.avpairDF(spark, cfg),
      shufflePartitions = 4)
    val v = out.vertices.cache()
    assert(v.count() === v.select("name").distinct().count())
    assert(v.count() === v.select("vertex_id").distinct().count(), "xxhash64 collision-free here")
    assert(v.filter(col("labels") =!= sort_array(col("labels"))).count() === 0)
    val e = out.edges.cache()
    assert(e.count() === e.dropDuplicates("src", "dst", "rel").count())
    // referential integrity: every edge endpoint is a vertex
    val ids = v.select(col("vertex_id"))
    assert(e.join(ids, e("src") === ids("vertex_id"), "left_anti").count() === 0)
    assert(e.join(ids, e("dst") === ids("vertex_id"), "left_anti").count() === 0)
  }
}
