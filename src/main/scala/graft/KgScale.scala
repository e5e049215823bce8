package graft

import graft.gen.{Corpus, CorpusData}
import org.apache.spark.sql.SparkSession

/** Clean scaling probe: one parallelism level per JVM, one untimed warmup
  * pipeline run (JIT/codegen), then the measured run on fresh (unpersisted)
  * inputs. Prints `[scale] cpus=N docs=M wall=S triples=K tput=T`. */
object KgScale {
  def main(args: Array[String]): Unit = {
    // arg0: thread count for local[N], or executor count E for
    // local-cluster[E,cores,mem] when SPARK_GRAFT_EXEC_CORES is set —
    // separate executor JVMs, the faithful stand-in for E executors.
    val cpus = args(0).toInt
    val nDocs = if (args.length > 1) args(1).toInt else 200000
    val execCores = sys.env.get("SPARK_GRAFT_EXEC_CORES").map(_.toInt)
    val totalCores = execCores.map(_ * cpus).getOrElse(cpus)
    val master = execCores match {
      case Some(c) => s"local-cluster[$cpus,$c,${sys.env.getOrElse("SPARK_GRAFT_EXEC_MB", "6144")}]"
      case None => s"local[$cpus]"
    }
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder().master(master)
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", totalCores.toString))
      // scaled-down stand-in: the corpus is ~100 MB, not 100 TB — keep the
      // split size proportionally small so scan parallelism is set by the
      // cluster size, exactly as the default 128 MB does on a real lake
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE's 64m default advisory re-coalesces the dedup exchange into
      // ~1.4M-key partitions whose agg hash maps fall back to sort+spill
      // (superlinear CPU). A smaller advisory keeps the per-task map O(cache).
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "16m"))
      .config("spark.locality.wait",
        sys.env.getOrElse("SPARK_GRAFT_LOCALITY_WAIT", "3s"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Int, Long, Long)]()
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    val jobStart = scala.collection.mutable.HashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(40), i.numTasks,
          wall, i.taskMetrics.executorRunTime))
      }
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart(j.jobId) = j.time
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs += ((j.jobId, jobStart.getOrElse(j.jobId, j.time), j.time))
    })

    def run(n: Int): Long = {
      val cfg = Corpus.Config(nDocs = n)
      // the measured job reads STORED parquet (like the real job reads the
      // lake) — the synthetic generator is allocation-bound and does not
      // represent a storage scan
      val path = s"/tmp/graft-bench-corpus-$n.parquet"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
        // realistic lake-table file granularity: many splits, so the scan
        // parallelism is set by the cluster, not by the writer's layout
        CorpusData.docsDF(spark, cfg).repartition(64)
          .write.mode("overwrite").parquet(path)
      val docs = spark.read.parquet(path)
      val out = KgPipeline.run(spark, docs,
        CorpusData.ment2entDF(spark, cfg), CorpusData.avpairDF(spark, cfg),
        shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", totalCores.toString).toInt,
        dimFastPaths = true)
      val n2 = out.triples.count()
      // drop caches so the next run starts cold
      spark.sharedState.cacheManager.clearCache()
      n2
    }
    run(5000) // warmup
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    val gc0 = gcMs
    val wall0 = System.currentTimeMillis()
    val t0 = System.nanoTime()
    val n = run(nDocs)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] cpus=$cpus docs=$nDocs wall=$sec%.2f triples=$n tput=${n / sec}%.0f gc=${(gcMs - gc0) / 1e3}%.1fs")
    if (sys.env.contains("SPARK_GRAFT_STAGES")) {
      val measured = jobs.filter(_._2 >= wall0)
      var prevEnd = 0L
      measured.sortBy(_._1).foreach { case (id, s, e) =>
        val gap = if (prevEnd == 0) 0 else s - prevEnd
        prevEnd = math.max(prevEnd, e)
        println(f"[job] $id%3d wall=${(e - s) / 1e3}%6.2fs gapBefore=${gap / 1e3}%6.2fs")
      }
      println(f"[stages] n=${stages.size} totalWall=${stages.map(_._4).sum / 1e3}%.1fs")
      stages.sortBy(-_._4).take(20).foreach { case (id, name, tasks, wall, run) =>
        println(f"[stage] $id%4d $name%-40s tasks=$tasks%3d wall=${wall / 1e3}%6.2fs cpu=${run / 1e3}%7.2fs")
      }
    }
    spark.stop()
  }
}
