package graft

import graft.datapipe.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch: corpus-side sign-bucket pass, native Expression vs interpreted
  * HOF, over the sf embeddings table (not part of the driver contract).
  * Usage: runMain graft.SignProbe [planes] [repeat] */
object SignProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val planes = if (args.nonEmpty) args(0).toInt else 8
    val repeat = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .localCheckpoint()
    val n = embs.count()
    def time(label: String, bucket: org.apache.spark.sql.Column): Unit = {
      var best = Double.MaxValue
      (0 until repeat).foreach { _ =>
        val t0 = System.nanoTime()
        embs.select(bucket.as("b")).write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[signprobe] $label%-8s planes=$planes rows=$n best=$best%6.2fs")
    }
    time("native", Similarity.signBucket(col("v"), planes))
    time("hof", Similarity.signBucketHof(col("v"), planes))
    spark.stop()
  }
}
