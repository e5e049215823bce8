package graft

import graft.stages._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: per-phase wall/CPU of the fused map pass over the stored bench
  * corpus — locates where the 8-core CPU inflation comes from (not part of
  * the driver contract). */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 8
    val path = if (args.length > 1) args(1)
      else "/tmp/graft-bench-corpus-1000000.parquet"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var cpu = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        cpu += sc.stageInfo.taskMetrics.executorRunTime
    })
    val docs = spark.read.parquet(path)
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val c0 = cpu
      val t0 = System.nanoTime()
      f
      println(f"[p] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs cpu=${(cpu - c0) / 1e3}%7.1fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("scan")(noop(docs))
    time("sortSpans")(noop(Normalize.withSortedSpans(docs)))
    time("normalize_blogs")(noop(Normalize.blogs(docs)))
    time("normalize_comments")(noop(Normalize.comments(docs)))
    time("emit")(noop(WeiboTriples.emit(
      Normalize.blogs(docs), Normalize.comments(docs))))
    time("emit+dedup")(noop(WeiboTriples.emit(
      Normalize.blogs(docs), Normalize.comments(docs))
      .groupBy("subj", "pred", "obj").agg(count(lit(1)).as("n"))))
    // column-family isolation: which blog column contends at 8 threads?
    val b = Normalize.blogs(docs)
    time("blogs_ids")(noop(b.select("doc_id", "mid", "uid")))
    time("blogs_stats")(noop(b.select("repost", "comment", "like")))
    time("blogs_user")(noop(b.select("username")))
    time("blogs_timeraw")(noop(b.select("time_raw")))
    time("blogs_aligntime")(noop(b.select("time")))
    time("blogs_valid")(noop(b.select("valid", "time_ok")))
    spark.stop()
  }
}
