package graft

import graft.datapipe.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the shapes that decide 100 TB behavior:
  * filters reach the parquet scan, column pruning holds, dimension joins
  * broadcast, candidate generation never degenerates to a nested-loop /
  * cartesian product, and the hot paths stay inside whole-stage codegen. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection are pushed into the parquet scan") {
    val p = plan(SparkEntry.queries("q_scan_filter_project")(spark, sf))
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("GreaterThan(l_quantity") || p.contains("IsNotNull(l_quantity"),
      s"quantity predicate not pushed:\n$p")
    // pruned ReadSchema: untouched wide columns must not be read
    assert(!p.contains("l_comment"), "column pruning failed — l_comment read")
  }

  test("dimension join plans as a broadcast hash join") {
    val p = plan(SparkEntry.queries("q_join_broadcast")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"nation dim not broadcast:\n$p")
  }

  test("LSH candidate generation is an equi-join — never nested-loop/cartesian") {
    val docs = Seq((0L, "a b c d e f"), (1L, "a b c d e g"), (2L, "x y z w q r"))
      .toDF("doc_id", "text")
    val p = plan(Dedup.lshCandidates(
      Dedup.lshBandsMd5(docs, "doc_id", "text", 8, 4, 3), maxBucket = 64))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"LSH candidates degenerated to a product join:\n$p")
  }

  test("embedding near-dup blocking joins on the bucket key, no product") {
    val embs = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)))
      .toDF("vec_id", "v")
    val p = plan(Dedup.embeddingNearDups(embs, "vec_id", "v", 0.5, planes = 4))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"near-dup blocking degenerated to a product join:\n$p")
    // the guard must be IN the plan: a count aggregate feeding the bucket
    // join (dense buckets filtered before any pair expansion), and the pair
    // source is the bounded collect_list arrays, not a bucket self-join of
    // the vector-carrying stream
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"no bucket-count guard aggregate in the near-dup plan:\n$p")
    assert(p.contains("collect_list"),
      s"pair expansion is not array-bounded:\n$p")
  }

  test("IVF cell assignment is a pure projection — no window, no exchange") {
    // parquet-backed corpus: a literal local DF constant-folds the whole
    // assignment to a LocalTableScan (itself proof of the pure-projection
    // shape, but it hides the operator under test)
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val corpus = embs.select(col("vec_id").as("id"), col("v"))
    val cent = embs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val p = plan(graft.datapipe.Similarity.assignCells(corpus, cent))
    assert(!p.contains("Window"),
      s"corpus-side argmax regressed to a row_number window:\n$p")
    // round-7 shape: the centroid table is a plan literal and the argmax is
    // the native best_cell loop — the corpus is never exchanged at all (the
    // previous max_by aggregate still shuffled one struct per vector)
    assert(!p.contains("Exchange"),
      s"cell assignment shuffles the corpus:\n$p")
    assert(p.contains("best_cell"),
      s"native best_cell argmax missing from the assignment plan:\n$p")
  }

  test("native sign bucket stays inside whole-stage codegen") {
    // parquet-backed source — a literal local DF constant-folds to a
    // LocalTableScan and proves nothing about the projection
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val df = embs.select(
      graft.datapipe.Similarity.signBucket(col("v"), 8).as("b"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"sign-bucket projection fell out of codegen:\n$p")
  }

  test("decontamination broadcasts the benchmark gram set — no corpus shuffle join") {
    val p = plan(SparkEntry.queries("q_decontaminate")(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"benchmark side not a broadcast semi-join:\n$p")
  }

  test("decontamination pass 1 exchanges are hash-width — gram text never shuffles corpus-wide") {
    // at production n = 13 the gram string dwarfs its md5; the corpus-wide
    // hit count must exchange (id, gh[-derived]) rows only. The raw gram
    // column ('sh'/'g') lives exclusively in pass 2, which is restricted to
    // the contaminated doc set.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bench = Dedup.benchGramHashes(
      docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", 13)
    val hits = Dedup.decontaminateHits(docs, bench, "doc_id", "text", 13)
    hits.collect() // materialize the AQE final plan
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: ShuffleExchangeLike => e +: p.children.flatMap(exchanges)
      case _ => p.children.flatMap(exchanges)
    }
    val ex = exchanges(hits.queryExecution.executedPlan)
    assert(ex.nonEmpty, "expected at least the per-doc hit-count exchange")
    ex.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.exists(n => n == "sh" || n == "g"),
        s"gram text reached a corpus-wide shuffle exchange: ${names.mkString(",")}")
    }
  }

  test("top-bigram fraction aggregates partially before the shuffle") {
    // the (doc, bigram) count must map-side combine: a partial HashAggregate
    // below the Exchange, so rows shuffled are (doc, DISTINCT bigram), not
    // every bigram occurrence
    val p = plan(SparkEntry.queries("q_top_bigram")(spark, sf))
    val exchangeAt = p.indexOf("Exchange hashpartitioning")
    val partialAt = p.lastIndexOf("HashAggregate")
    assert(exchangeAt >= 0 && partialAt > exchangeAt,
      s"no partial aggregate below the shuffle:\n$p")
  }

  test("chunk dedup: two-phase aggregate on the chunk hash — no window, no product") {
    val p = plan(SparkEntry.queries("q_chunk_dedup")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"chunk dedup degenerated to a product join:\n$p")
    // first-occurrence must be the skew-safe min(struct) hash aggregate: a
    // window on the chunk-hash key puts every copy of a hot boilerplate
    // chunk into ONE sort group on one reducer (AQE skew handling covers
    // joins, not window exchanges)
    assert(!p.contains("Window"),
      s"chunk first-occurrence regressed to a window on the hash key:\n$p")
    // min(struct) buffers a non-primitive → partial/final SortAggregate
    // pairs are acceptable; what matters is it aggregates (map-side
    // combined), not window-sorts, on the hash key
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"),
      s"no aggregate first-occurrence selection in the plan:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"chunk dedup collapsed to a single partition:\n$p")
  }

  test("boilerplate scrub: anti-join removal, aggregate doc-frequency, no window") {
    val p = plan(SparkEntry.queries("q_boilerplate_scrub")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"boilerplate scrub degenerated to a product join:\n$p")
    // removal must be the anti-join shape (AQE skew-split applies to hot
    // boilerplate hashes there), never a window on the hash key
    assert(p.contains("LeftAnti"), s"no anti-join removal in plan:\n$p")
    assert(!p.contains("Window"),
      s"boilerplate doc-frequency regressed to a window:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"boilerplate scrub collapsed to a single partition:\n$p")
  }

  test("keep-best rep selection: two-phase aggregate argmax, never a window") {
    val p = plan(SparkEntry.queries("q_dedup_keep_best")(spark, sf))
    assert(!p.contains("Window"),
      s"cluster argmax regressed to a window (single sort group per hot cluster):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"keep-best degenerated to a product join:\n$p")
    // the min(struct) argmax buffers a struct, so it plans as a
    // SortAggregate — still TWO-PHASE (partial_min map-side absorbs hot
    // clusters before the exchange, exactly the property the pin guards;
    // the anti-pattern is a per-cluster WINDOW, excluded above); the scrub
    // upstream no longer contributes a HashAggregate since the memoized
    // keepMap enters as a checkpoint scan
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"),
      s"no two-phase aggregate argmax in plan:\n$p")
    assert(p.contains("partial_min"),
      s"argmax lost its map-side partial aggregation:\n$p")
  }

  test("mix rebalance: rates dim broadcast back, hash-mod filter, no window") {
    val p = plan(SparkEntry.queries("q_mix_rebalance")(spark, sf))
    assert(!p.contains("Window"), s"rebalance plan grew a window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-stratum rates dim is not broadcast back to the corpus:\n$p")
  }

  test("corpus-scrub projection: ONE fused text walk per row, inside codegen") {
    import graft.functions.TextCounts
    val df = SparkEntry.queries("q_corpus_scrub")(spark, sf)
    TextCounts.evals.set(0)
    TextCounts.countEvals = true
    val n = try df.collect().length finally TextCounts.countEvals = false
    val walks = TextCounts.evals.get()
    assert(n > 0)
    // quality + langid + dup_frac read the struct ~10 times per row; CSE
    // must collapse them to one walk (2n headroom for speculative retries)
    assert(walks <= 2L * n,
      s"fused text walk ran $walks times for $n rows — subexpression " +
        "elimination is not collapsing the scrub projection")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"scrub projection fell out of codegen:\n$p")
  }

  test("duplicate-span scrub: dup test + canonical pick are one aggregate — no window, no product") {
    val p = plan(SparkEntry.queries("q_dup_span_scrub")(spark, sf))
    // a window over the gram hash would put every copy of a hot boilerplate
    // gram (license header at 10^8 copies) into one sort group; the
    // min(struct) must ride the SAME two-phase aggregate as the dup count
    assert(!p.contains("Window"),
      s"canonical-occurrence pick regressed to a window on the gram hash:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"span scrub degenerated to a product join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"span scrub collapsed to a single partition:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"),
      s"no aggregate dup/canonical selection in the plan:\n$p")
  }

  test("LM scoring: distinct-word reduction aggregates before the model join; no window") {
    val df = SparkEntry.queries("q_lm_score")(spark, sf)
    df.collect() // materialize the AQE final plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"LM scoring uses a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"LM scoring degenerated to a product join:\n$p")
    // the (doc, word) count must exist as an aggregate UPSTREAM of the
    // model join — the exchange carries distinct-word rows, not tokens
    assert(p.contains("HashAggregate"),
      s"no two-phase word-count aggregate before the model join:\n$p")
  }

  test("bigram LM: one corpus tokenization feeds both models; no window, no product") {
    val df = SparkEntry.queries("q_lm_bigram")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"bigram LM uses a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"bigram LM degenerated to a product join:\n$p")
    assert(p.contains("HashAggregate"),
      s"no two-phase bigram-count aggregate before the model joins:\n$p")
  }

  test("approx profile: HLL sketch aggregate, no exact-distinct Expand") {
    // the exact profile plans an Expand (one duplicated stream per distinct
    // aggregate) — at 100 TB a corpus-width exchange of every profiled
    // value; the sketch form must stay a single two-phase aggregate whose
    // exchange carries fixed-size HLL buffers
    val df = graft.datapipe.Profile.columnProfileApprox(
      spark.read.parquet(s"$sf/documents.parquet"),
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Expand"),
      s"approx profile regressed to the exact-distinct Expand:\n$p")
    assert(p.contains("approx_count_distinct"),
      s"no HLL sketch aggregate in the approx profile:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"approx profile collapsed to a single partition:\n$p")
  }

  test("exact-dedup hot path stays inside whole-stage codegen") {
    // fingerprint (trim/regexp_replace/lower/md5) + two-phase HashAggregate
    // must all live in codegen stages ("*(n)" spans); lambda higher-order
    // expressions (quality score) are interpreted by design — they run in a
    // single narrow pass where the scan dominates
    val df = SparkEntry.queries("q_dedup_exact")(spark, sf)
    df.collect() // materialize THIS QueryExecution's AQE final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"no whole-stage-codegen span:\n$p")
    assert(p.contains("HashAggregate"), s"dedup not a hash aggregate:\n$p")
  }
}
