package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against the full corpus, one pass, no corpus shuffle. Scale path: an
  * LSH (random-hyperplane) bucketed variant that probes only matching
  * buckets, trading recall for a bucket-local candidate set; the bucket key
  * join replaces the cross product. Deterministic throughout (hyperplanes
  * derive from md5 of (plane, dim) — no RNG state).
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * maps md5 to ±1. */
  private def planeSign(p: Int, d: Column): Column =
    when(conv(substring(md5(concat(lit(p.toString), lit("_"), d.cast("string"))),
      1, 6), 16, 10).cast("long") % 2 === 0, 1.0).otherwise(-1.0)

  /** Random-hyperplane sign bucket: `planes` sign bits of the vector's dot
    * products with deterministic ±1 hyperplanes. */
  def signBucket(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding self). Query set is broadcast; ties broken by id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val scored = q.join(c, col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        round(Dedup.cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: only corpus vectors in the query's sign bucket are
    * scored. Same output shape as bruteForceTopK; recall < 1 by design.
    * `probes` > 0 adds multi-probe OR-amplification: each query also probes
    * the buckets at Hamming distance ≤ `probes` bit-flips of its own (the
    * standard recall recovery — a near neighbor that landed one hyperplane
    * away is still found), trading a (planes choose probes)-fold fan-out of
    * the SMALL query side — the corpus is still scanned once and joined on
    * the bucket key. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 8,
              probes: Int = 0): DataFrame = {
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), planes).as("bucket0"))
    // probe set: the exact bucket plus single-bit flips (probes=1), etc.
    val flips: Seq[Column] = lit(0L) +: (if (probes >= 1)
      (0 until planes).map(p => lit(1L << p)) else Seq.empty)
    val q = q0.select(col("query_id"), col("qv"),
      explode(array_distinct(array(flips.map(f =>
        col("bucket0").bitwiseXOR(f)): _*))).as("bucket"))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), planes).as("bucket"))
    // a corpus vector has exactly ONE bucket and the probe set is distinct,
    // so each (query, corpus) pair matches at most once — no dedup needed
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        round(Dedup.cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: corpus vectors are assigned to their nearest centroid
    * (one broadcast-join pass — the inverted-file build); each query scores
    * only the `nProbe` centroid cells nearest to it. Centroid TRAINING is
    * deliberately a deterministic seed rule (the first `nCentroids` corpus
    * ids) — a k-means loop slots in where `centroids` is built, and the
    * cell-assignment / multi-cell-probe / rank plumbing here is the part
    * that must scale. Similarity values are rounded to 6 before argmax, so
    * the assignment is engine-portable (the DuckDB oracle reproduces it).
    * Output shape matches [[bruteForceTopK]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int = 16,
              nProbe: Int = 2): DataFrame = {
    val cent = broadcast(corpus
      .filter(col(idCol) < nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cv")))
    def nearestCells(df: DataFrame, id: String, vec: String, n: Int) = {
      val w = Window.partitionBy(id)
        .orderBy(col("csim").desc, col("cid").asc)
      df.join(cent, lit(true)) // every vector × the SMALL broadcast centroid dim
        .select(col(id), col(vec), col("cid"),
          round(Dedup.cosine(col(vec), col("cv")), 6).as("csim"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .drop("csim", "crank")
    }
    val cells = nearestCells(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "id", "v", 1)
    val probes = nearestCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", nProbe)
    val scored = probes.join(cells, Seq("cid"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        round(Dedup.cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Recall@k of an approximate top-k result against the exact one: per
    * query, |approx ∩ exact| / k. Both inputs are the (query_id, id, …)
    * shape the topK operators emit. This is the self-check a production ANN
    * deployment runs on a sampled query slice — the sample is small, so the
    * join is broadcast-sized even when the index covers the full corpus. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = approx.select(col("query_id"), col("id"), lit(1).as("hit"))
    exact.select("query_id", "id")
      .join(hits, Seq("query_id", "id"), "left")
      .groupBy("query_id")
      .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / k, 4)
        .as("recall"))
  }
}
