package graft

import graft.datapipe.Packing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-scale probe for the sequence-packing prefix sum (not part of the
  * driver contract): synthesizes N deterministic flat-text docs, runs
  * packIndex + packStats at seqLen 2048, prints wall + tokens/sec. The
  * point being measured is the TWO-PHASE prefix sum at millions of rows —
  * the naive global-order window would funnel the whole table through one
  * reducer here.
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 2000000
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic doc lengths 1..120 tokens, text of repeated words
    val docs = spark.range(0, nDocs.toLong, 1, cpus * 4)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          array_repeat(lit("tok"), (pmod(col("id") * 2654435761L, lit(120)) + 1).cast("int")))
          .as("text"))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pack] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    // warmup for JIT
    Packing.packIndex(docs.limit(50000), "doc_id", "text", 2048L)
      .agg(max("seq_last")).collect()

    // packIndex is eager in phase 1 (the per-partition totals collect), so
    // end-to-end = construction + result materialization
    val t0 = System.nanoTime()
    val idx = time("phase1")(Packing.packIndex(docs, "doc_id", "text", 2048L))
    val total = time("phase2")(
      idx.agg(max(col("start_offset") + col("n_tokens"))).collect()(0).getLong(0))
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[pack] end_to_end   $wall%8.2fs")
    val nSeqs = time("packStats")(Packing.packStats(idx, 2048L).count())
    println(f"[pack] docs=$nDocs tokens=$total seqs=$nSeqs " +
      f"tokens_per_sec=${(total / wall).toLong}")
    spark.stop()
  }
}
