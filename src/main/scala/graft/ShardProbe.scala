package graft

import graft.datapipe.Packing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose q_shard_audit's wall (packIndex vs shard write vs
  * audit re-read) at the bench shape — not part of the driver contract. */
object ShardProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[shard] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val out = java.nio.file.Files.createTempDirectory("shardprobe").toString
      val idx = time("packIndex")(
        Packing.packIndex(docs, "doc_id", "text", seqLen = 256L))
      val seqsPerShard = 4L
      def writeIt(spsh: Long, tag: String, v2: Boolean): Unit = time(tag) {
        val w = idx.withColumn("shard_id",
            explode(sequence(expr(s"seq_first div $spsh"),
              expr(s"seq_last div $spsh"))))
          .repartition(col("shard_id"))
          .write.mode("overwrite").partitionBy("shard_id")
        (if (v2) w.option("mapreduce.fileoutputcommitter.algorithm.version", "2")
         else w).parquet(s"$out/shards-$tag")
      }
      writeIt(4L, "write265v1", v2 = false)
      writeIt(4L, "write265v2", v2 = true)
      writeIt(128L, "write9v1", v2 = false)
      writeIt(4L, "write265v1b", v2 = false)
      time("writeFlat")(
        idx.withColumn("shard_id",
            explode(sequence(expr(s"seq_first div 4"),
              expr(s"seq_last div 4"))))
          .repartition(col("shard_id"))
          .write.mode("overwrite").parquet(s"$out/flat"))
      // fewer tasks, same one-file-per-shard layout: hash all 265 shards
      // over `cores` reducers — each task writes ~8 whole partition dirs
      // sequentially; tests whether the wall is per-TASK overhead (265
      // scheduling/committer/commit units) or per-DIR writer cost
      def writeTasks(n: Int, tag: String): Unit = time(tag)(
        idx.withColumn("shard_id",
            explode(sequence(expr(s"seq_first div $seqsPerShard"),
              expr(s"seq_last div $seqsPerShard"))))
          .repartition(n, col("shard_id"))
          .write.mode("overwrite").partitionBy("shard_id")
          .parquet(s"$out/shards-t$n"))
      writeTasks(32, "writeT32")
      writeTasks(64, "writeT64")
      writeTasks(128, "writeT128")
      time("write")(
        idx.withColumn("shard_id",
            explode(sequence(expr(s"seq_first div $seqsPerShard"),
              expr(s"seq_last div $seqsPerShard"))))
          .repartition(col("shard_id"))
          .write.mode("overwrite").partitionBy("shard_id")
          .parquet(s"$out/shards"))
      val audited = time("auditRead") {
        val shardTok = 256L * seqsPerShard
        val end = col("start_offset") + col("n_tokens") - 1
        spark.read.parquet(s"$out/shards")
          .withColumn("owned",
            least(end, (col("shard_id") + 1) * shardTok - 1) -
              greatest(col("start_offset"), col("shard_id") * shardTok) + 1)
          .groupBy("shard_id")
          .agg(count(lit(1)).as("n_docs"), sum("owned").as("n_tokens"),
            (max(expr(s"least(seq_last, (shard_id + 1) * $seqsPerShard - 1)")) -
              min(expr(s"greatest(seq_first, shard_id * $seqsPerShard)")) + 1)
              .as("n_seqs"))
      }
      time("auditNoop")(
        audited.write.format("noop").mode("overwrite").save())
      val nShards = spark.read.parquet(s"$out/shards")
        .select("shard_id").distinct().count()
      println(s"[shard] nShards=$nShards")
    }
    spark.stop()
  }
}
