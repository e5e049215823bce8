package graft

import graft.functions.{SpanFields, TextExtract => TE, UrlParseExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate the per-column CPU of the blog stat/time expressions
  * (PhaseProbe follow-up) — not part of the driver contract. */
object StatProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 8
    val path = if (args.length > 1) args(1)
      else "/tmp/graft-bench-corpus-4000000.parquet"
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
      println(f"[s] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs cpu=${(cpu - c0) / 1e3}%7.1fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val base = docs.filter(!graft.functions.HasSpanKind(col("spans"), "cid"))
      .select(col("doc_id"), SpanFields(col("spans")).as("sf"))
    time("sf_only")(noop(base.select(col("doc_id"))))
    time("stats_raw")(noop(base.select(
      col("sf.stat_0"), col("sf.stat_1"), col("sf.stat_2"))))
    time("stats_digit")(noop(base.select(
      UrlParseExpr.digitSuffix(col("sf.stat_0")),
      UrlParseExpr.digitSuffix(col("sf.stat_1")),
      UrlParseExpr.digitSuffix(col("sf.stat_2")))))
    time("stats_full")(noop(base.select(
      TE.intOrZero(col("sf.stat_0")),
      TE.intOrZero(col("sf.stat_1")),
      TE.intOrZero(col("sf.stat_2")))))
    time("timeraw_only")(noop(base.select(col("sf.ctime_text"), col("sf.time_text"))))
    val timeClean = translate(col("sf.time_text"), "\n", "")
    val timeRaw =
      when(col("sf.ctime_text").isNotNull,
        when(col("sf.ctime_text").contains("<div"), trim(TE.titleAttr(col("sf.ctime_text"))))
          .otherwise(col("sf.ctime_text")))
      .when(col("sf.time_text").isNotNull,
        when(timeClean.contains("<a"), TE.anchorText(timeClean)).otherwise(trim(timeClean)))
    time("timeraw_expr")(noop(base.select(timeRaw.as("tr"))))
    time("aligntime")(noop(base.select(
      TE.alignTime(col("sf.scrap_text"), timeRaw).as("t"))))
    spark.stop()
  }
}

/** Print the physical plan of blogs.select(stats) to check pruning. */
object StatPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/tmp/graft-bench-corpus-20000.parquet")
    val b = graft.stages.Normalize.blogs(docs)
    val p = b.select("repost", "comment", "like").queryExecution.executedPlan.toString
    println("=== stats plan ===")
    println(p.take(4000))
    val p2 = b.select("doc_id", "mid", "uid").queryExecution.executedPlan.toString
    println("=== ids plan ===")
    println(p2.take(2500))
  }
}
