package graft

import graft.core.{Rules, TableIO}
import graft.stages._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction dataflow (the north star):
  *
  *   docs ─► normalize (narrow) ─► weibo triples
  *        ─► text spans ─► trie mention detect ─► distinct mentions
  *        ─► KB BFS expand (broadcast dims, anti-join visited)
  *        ─► canonicalize (alias CC, salted) ─► two-phase triple dedup
  *        ─► vertices / edges materialize
  *
  * Each stage optionally checkpoints through [[TableIO]] (Iceberg-style
  * snapshot + lineage manifest); a killed run resumes from the last committed
  * snapshot, skipping finished stages entirely.
  */
object KgPipeline {

  case class Outputs(triples: DataFrame, vertices: DataFrame, edges: DataFrame)

  /** text spans of every doc: (doc_id, span_offset, text) — one explode. */
  def textSpans(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "text" && col("s.text").isNotNull)
      .select(col("doc_id"), col("s.offset").as("span_offset"), col("s.text").as("text"))

  /** Canonicalized distinct triple set with provenance. */
  /** @param dimFastPaths when true, the dimension-bounded passes (KB BFS
    *   closure, alias CC) use their driver fast paths below the collectable
    *   threshold (see KbExpand/Canon docs). The golden P/R suite runs with
    *   false — pure dataflow — so the gate never tests driver code against
    *   driver code; KgParitySpec asserts both modes emit identical triples. */
  def run(spark: SparkSession, docs: DataFrame, ment2ent: DataFrame,
          avpair: DataFrame, io: Option[TableIO] = None,
          shufflePartitions: Int = 32,
          dimFastPaths: Boolean = false,
          dimBound: Long = 2000000L): Outputs = {
    val dimThreshold = if (dimFastPaths) dimBound else 0L

    // Reap obsolete shuffle/broadcast state before the wide job. In a
    // long-lived driver (notebook, streaming service, a bench loop) the
    // references to earlier jobs' shuffles die, but with a large,
    // pressure-free driver heap the JVM may not GC for tens of minutes —
    // and Spark's ContextCleaner only reaps executor-side shuffle files
    // and broadcast blocks when those driver references are COLLECTED
    // (spark.cleaner.periodicGC.interval, default 30 min, exists for
    // exactly this). A pipeline entry is the natural reap boundary:
    // measured on the 4-executor scaling rig, back-to-back runs in one
    // session degrade 22 s → 29 s → 37 s without this and hold 21-24 s
    // with it (the accumulated state starves the fixed-size executors);
    // the GC itself costs well under a second against a multi-second job.
    if (sys.env.getOrElse("SPARK_GRAFT_ENTRY_GC", "1") != "0") System.gc()

    // Stage boundaries: snapshot commit when checkpointing. Without io the
    // big stages stay LAZY — with single-pass triple emission each wide
    // input is scanned at most twice, and in-memory caching of fat rows
    // serializes local-mode tasks on the MemoryStore lock (measured: 3/32
    // threads busy during cache build). Only the small dim-side stages
    // (kb, canon_map) are checkpointed via `small()`.
    def stage(name: String, upstream: Seq[String],
              counters: => Map[String, Long] = Map.empty)
             (f: => DataFrame): DataFrame =
      io match {
        case Some(t) => t.runOrResume(name, upstream, counters)(f)
        case None => f
      }
    def small(df: DataFrame): DataFrame =
      if (io.isDefined) df else df.localCheckpoint()

    // quarantine metrics — the dataflow image of the reference's println
    // dead-letter paths (FromScrappyDump.kt:166, 179–182, 228–232, 296–299):
    // counted per stage into the lineage manifest instead of logged
    def weiboCounters: Map[String, Long] = {
      val b = Normalize.blogs(docs).agg(
        sum(when(!col("valid"), 1L).otherwise(0L)).as("invalid"),
        sum(when(col("valid") && !col("time_ok"), 1L).otherwise(0L)).as("bad_time")
      ).collect()(0)
      val c = Normalize.comments(docs).agg(
        sum(when(!col("valid"), 1L).otherwise(0L)).as("invalid")).collect()(0)
      Map(
        "blogs_skipped" -> Option(b.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L),
        "blogs_bad_time" -> Option(b.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
        "comments_skipped" -> Option(c.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }

    val weibo = stage("weibo_triples", Seq.empty, weiboCounters) {
      WeiboTriples.emit(Normalize.blogs(docs), Normalize.comments(docs))
    }

    // FUSED dim phase (no checkpointing io, dims driver-bounded): the KB
    // closure and the canonical map both derive from dimension-bounded data
    // the fast paths collect anyway, so compute BOTH fully driver-side and
    // hand the big job two LocalRelations. vs the staged path this spares
    // the kb checkpoint, canon count/collect/checkpoint and the kb-join
    // jobs — measured ~10 small jobs + planning gaps of pure serial driver
    // latency that lands 1:1 on the small-cluster pipeline wall — and
    // overlaps the avpair collect with the corpus-wide mention scan.
    // Falls back to the staged dataflow when a dim exceeds its bound;
    // KgParitySpec pins fused ≡ dataflow on the triple set. The probe's
    // ment2ent collect and corpus-wide mention scan are EXPENSIVE — when
    // the probe bails (avpair over bound, or canonicalMapLocal declining
    // the quadratic loop) they are handed to the staged path below instead
    // of being recomputed, so the fallback never pays the dim phase twice.
    var probedM2e: Array[(String, Seq[String])] = null
    var probedSeeds: Array[String] = null
    // set when the m2e dimension exceeds the driver bound: the staged path
    // below must then not re-attempt the collect (broadcast-trie build) and
    // routes mention detection through the distributed substring fallback
    var m2eOverBound = false
    val fusedDims: Option[(DataFrame, DataFrame)] =
      if (dimThreshold > 0 && io.isEmpty) {
        import spark.implicits._
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        // size guard folded into the collect (limit N+1): one job, and it
        // runs CONCURRENTLY with the m2e collect + mention scan below
        val avF = Future {
          avpair.select(col("entity"), col("pred"), col("obj"))
            .limit(math.min(dimThreshold, Int.MaxValue - 2L).toInt + 1)
            .as[(String, String, String)].collect()
        }
        // the m2e collect carries the SAME limit-N+1 probe as avpair: a
        // dictionary 100× the bound must degrade to the dataflow path, not
        // OOM the driver (the last unguarded dim materialization)
        val m2eRows = ment2ent.select(col("mention"), col("entities"))
          .limit(math.min(dimThreshold, Int.MaxValue - 2L).toInt + 1)
          .as[(String, Seq[String])].collect()
        if (m2eRows.length > dimThreshold) {
          m2eOverBound = true
          Await.result(avF, Duration.Inf) // don't leak the concurrent job
          None
        } else {
        probedM2e = m2eRows
        val dict = m2eRows.iterator.map(_._1).toSeq.distinct
        val seeds = Mentions.detect(spark, textSpans(docs), dict)
          .select(col("mention")).distinct().as[String].collect()
        probedSeeds = seeds
        val avRows = Await.result(avF, Duration.Inf)
        if (avRows.length > dimThreshold) None
        else {
          val trace = sys.env.contains("SPARK_GRAFT_DIM_TRACE")
          def tr(tag: String, t0: Long): Long = {
            val t = System.nanoTime()
            if (trace) println(f"[dim] $tag ${(t - t0) / 1e6}%.0fms")
            t
          }
          var t0 = System.nanoTime()
          val av = avRows.groupBy(_._1)
          val visited = KbExpand.expandLocal(seeds, m2eRows.toMap, av, Rules.recursivePreds)
          val kbLocal = KbExpand.triplesLocal(visited, av)
          t0 = tr("bfs+triples", t0)
          val cm = Canon.canonicalMapLocal(kbLocal, Rules.categoryPred, Rules.aliasPreds)
          t0 = tr("canon", t0)
          val out = cm.map(c => (kbLocal.toDF("subj", "pred", "obj"),
            c.toDF("name", "comp")))
          tr("toDF", t0)
          out
        }
        }
      } else None

    val kb = fusedDims.map(_._1).getOrElse(small(stage("kb_triples", Seq.empty) {
      import spark.implicits._
      // ONE collect of the bounded ment2ent dimension feeds both the trie
      // dictionary and (via m2eCollected) the fast-path closure — the dim
      // phase is serial driver latency on the critical path, so every
      // spared job shows up directly in the small-cluster wall. When the
      // fused probe above already collected the dim and scanned mentions,
      // reuse both instead of recomputing (the probe-bail path). The
      // collect carries the limit-N+1 probe (dimBound even in pure-dataflow
      // mode — the broadcast-trie build is driver-resident regardless of
      // the dim fast paths); an over-bound dictionary routes through the
      // DISTRIBUTED substring detect and the dataflow BFS, where the
      // dictionary is never collected or force-broadcast.
      val m2eRows =
        if (probedM2e != null) probedM2e
        else if (m2eOverBound) null
        else {
          val rows = ment2ent.select(col("mention"), col("entities"))
            .limit(math.min(dimBound, Int.MaxValue - 2L).toInt + 1)
            .as[(String, Seq[String])].collect()
          if (rows.length > dimBound) { m2eOverBound = true; null } else rows
        }
      if (m2eRows == null) {
        val mentions = Mentions
          .detectBySubstring(spark, textSpans(docs), ment2ent.select("mention"))
          .select(col("mention")).distinct()
        KbExpand.expand(spark, mentions, ment2ent, avpair, Rules.recursivePreds,
          driverThreshold = dimThreshold, m2eCollected = None,
          m2eTooLarge = true)
      } else {
        val dict = m2eRows.iterator.map(_._1).toSeq.distinct
        val mentions =
          if (probedSeeds != null) probedSeeds.toSeq.toDF("mention")
          else Mentions.detect(spark, textSpans(docs), dict)
            .select(col("mention")).distinct()
        KbExpand.expand(spark, mentions, ment2ent, avpair, Rules.recursivePreds,
          driverThreshold = dimThreshold,
          m2eCollected = if (dimThreshold > 0) Some(m2eRows.toMap) else None)
      }
    }))

    val kbT = kb.select(col("subj"), col("pred"), col("obj"),
      lit(null).cast("string").as("doc_id"), lit(-1).as("span_offset"))

    // the CC pass runs once and is snapshot-committed: resume never re-iterates
    val canonMap = fusedDims.map(_._2).getOrElse(
      small(stage("canon_map", Seq("kb_triples")) {
        Canon.canonicalMap(kb, Rules.categoryPred, Rules.aliasPreds,
          ccDriverThreshold = dimThreshold)
      }))

    val triples = stage("triples", Seq("weibo_triples", "kb_triples", "canon_map")) {
      val all = Canon.canonicalize(weibo.unionByName(kbT), canonMap)
      // Two-phase dedup (SURVEY.md §4.2.5): partial hash-agg per partition,
      // then ONE shuffle hashed on the FULL (subj, pred, obj) key — never on
      // subj alone: the planted hot root makes subj heavily skewed (one
      // celebrity subject owns ~30% of repost triples) and a subj-keyed
      // exchange creates a straggler partition. The composite key is
      // high-cardinality and skew-free; AQE coalesces the final width.
      all
        .groupBy("subj", "pred", "obj")
        .agg(min(col("doc_id")).as("doc_id"),
          min(col("span_offset")).as("span_offset"))
    }

    val labels = Canon.nodeLabels(
      Canon.canonicalize(kbT, canonMap), Rules.categoryPred)

    val vertices = stage("vertices", Seq("triples")) {
      GraphOut.vertices(triples, labels, shufflePartitions)
    }
    val edges = stage("edges", Seq("triples")) {
      GraphOut.edges(triples, shufflePartitions)
    }
    Outputs(triples, vertices, edges)
  }
}
