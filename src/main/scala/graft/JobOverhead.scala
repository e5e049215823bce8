package graft

import org.apache.spark.sql.SparkSession

/** Microbenchmark: per-job latency for trivial jobs at a given parallelism. */
object JobOverhead {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    (1 to 5).foreach(_ => spark.range(1000).count())
    var t0 = System.nanoTime()
    (1 to 30).foreach(_ => spark.range(100).repartition(cpus).count())
    println(f"[job] cpus=$cpus trivial-shuffle-job avg=${(System.nanoTime() - t0) / 30e6}%.1f ms")
    t0 = System.nanoTime()
    (1 to 30).foreach(_ => spark.range(1000000).count())
    println(f"[job] cpus=$cpus narrow-count avg=${(System.nanoTime() - t0) / 30e6}%.1f ms")
    spark.stop()
  }
}
