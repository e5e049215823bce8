package graft

import graft.gen.{Corpus, CorpusData}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scratch: reproduce Bench.timeKg's 4-exec wall EXACTLY (prewarm session,
  * 80k warmup, same confs) and bisect why it reads ~31.6 s where KgScale
  * reads ~22 s for the identical measured job. Not part of the driver
  * contract. Env toggles:
  *   REPRO_PREWARM=0   skip the local[32] prewarm session
  *   REPRO_WARMDOCS=N  warmup corpus size (default 80000, Bench's value)
  *   REPRO_RUNS=N      measured runs, min reported (default 1)
  */
object ScaleRepro {
  private def session(master: String, parts: Int): SparkSession = {
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val s = SparkSession.builder()
      .master(master)
      .appName("graft-scale-repro")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val corpusCache = "/tmp/graft-bench-corpus"

  private def ensureCorpus(s: SparkSession, nDocs: Int): String = {
    val path = s"$corpusCache-$nDocs.parquet"
    if (!Files.exists(Paths.get(path)))
      CorpusData.docsDF(s, Corpus.Config(nDocs = nDocs)).repartition(64)
        .write.mode("overwrite").parquet(path)
    path
  }

  def main(args: Array[String]): Unit = {
    val executors = if (args.length > 0) args(0).toInt else 4
    val kgDocs = 4000000
    val shuffleParts = 64
    val warmDocs = sys.env.getOrElse("REPRO_WARMDOCS", "80000").toInt
    val runs = sys.env.getOrElse("REPRO_RUNS", "1").toInt

    if (sys.env.getOrElse("REPRO_PREWARM", "1") != "0") {
      val warm = session("local[32]", 32)
      try {
        ensureCorpus(warm, kgDocs)
        warm.read.parquet(s"$corpusCache-$kgDocs.parquet")
          .write.format("noop").mode("overwrite").save()
      } finally warm.stop()
      println("[repro] prewarm session done")
    }

    val master = s"local-cluster[$executors,2,6144]"
    val s = session(master, shuffleParts)
    try {
      val cfg = Corpus.Config(nDocs = kgDocs)
      val path = ensureCorpus(s, kgDocs)
      def run(): Long = {
        val out = KgPipeline.run(s, s.read.parquet(path),
          CorpusData.ment2entDF(s, cfg), CorpusData.avpairDF(s, cfg),
          shufflePartitions = shuffleParts, dimFastPaths = true)
        val n = out.triples.count()
        s.sharedState.cacheManager.clearCache()
        n
      }
      if (warmDocs > 0) {
        val warmCfg = Corpus.Config(nDocs = warmDocs)
        val warmPath = ensureCorpus(s, warmDocs)
        val t0 = System.nanoTime()
        KgPipeline.run(s, s.read.parquet(warmPath),
          CorpusData.ment2entDF(s, warmCfg), CorpusData.avpairDF(s, warmCfg),
          shufflePartitions = shuffleParts, dimFastPaths = true)
          .triples.count()
        s.sharedState.cacheManager.clearCache()
        println(f"[repro] warmup($warmDocs) ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      var best = Double.MaxValue
      (1 to runs).foreach { r =>
        if (sys.env.getOrElse("REPRO_GC", "0") != "0") {
          System.gc() // let the ContextCleaner reap shuffle state
          Thread.sleep(2000)
        }
        val t0 = System.nanoTime()
        val n = run()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[repro] run$r wall=$sec%.2fs triples=$n")
        best = math.min(best, sec)
      }
      println(f"[repro] execs=$executors best=$best%.2fs")
    } finally s.stop()
  }
}
