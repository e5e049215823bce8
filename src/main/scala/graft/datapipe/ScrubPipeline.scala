package graft.datapipe

import graft.core.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed fuzzy-dedup scrub — LSH blocking → exact Jaccard verify →
  * transitive closure → (doc, keeper) map — staged through [[TableIO]]
  * snapshots so a killed multi-hour run resumes from the last committed
  * stage instead of recomputing shingles.
  *
  * This gives the 100 TB scrub path the same restart semantics the KG
  * pipeline has (and the reference's own restart discipline —
  * FromScrappyDump.kt:352–357 resumes the dump scan from a high-water mark,
  * :392–406 flushes periodically so a crash loses at most one window):
  * each stage commits a snapshot + manifest (row counts, per-partition
  * lineage, upstream snapshot ids) via atomic rename, and `runOrResume`
  * skips any stage whose snapshot is already committed. The candidate
  * stage — the one that pays the corpus-wide shingle/minhash scan — is
  * exactly the stage a resume must never repeat.
  *
  * Without `io` the stages run lazily in one job graph (the gate-query
  * shape); the dataflow is IDENTICAL either way — stage functions are the
  * Dedup operators themselves, exchanged as plain DataFrames.
  */
object ScrubPipeline {

  case class Outputs(candidates: DataFrame, verified: DataFrame,
                     keepMap: DataFrame)

  /** @param docs       (idCol, textCol) corpus
    * @param io         Some(TableIO) → snapshot-commit each stage and
    *                   resume committed ones; None → lazy one-job dataflow
    * @param numHashes  minhash signature slots (md5 family)
    * @param bands      LSH bands (rows per band = numHashes / bands)
    * @param w          shingle width in tokens
    * @param threshold  exact-Jaccard keep threshold for the verify stage
    * @param maxBucket  LSH bucket-size guard (see Dedup.lshCandidates) */
  def run(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
          io: Option[TableIO] = None, numHashes: Int = 8, bands: Int = 4,
          w: Int = 3, threshold: Double = 0.7, maxBucket: Int = 64): Outputs = {
    def stage(name: String, upstream: Seq[String])(f: => DataFrame): DataFrame =
      io match {
        case Some(t) => t.runOrResume(name, upstream)(f)
        case None => f
      }

    val candidates = stage("lsh_candidates", Seq.empty) {
      Dedup.lshCandidates(
        Dedup.lshBandsMd5(docs, idCol, textCol, numHashes, bands, w), maxBucket)
    }
    val verified = stage("jaccard_verified", Seq("lsh_candidates")) {
      Dedup.jaccardVerify(candidates, docs, idCol, textCol, threshold)
    }
    val keepMap = stage("keep_map", Seq("jaccard_verified")) {
      Dedup.dedupClusters(verified.select("id1", "id2"))
        .select(col("id"), col("keep_id"))
    }
    Outputs(candidates, verified, keepMap)
  }
}
