package graft.gen

import graft.core.Schemas._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Spark-side corpus materialization: docs are synthesized IN the executors
  * (each doc is a pure function of (seed, index)), so generation itself
  * scales with parallelism and never materializes on the driver. */
object CorpusData {

  def docsDS(spark: SparkSession, cfg: Corpus.Config): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0, cfg.nDocs.toLong)
      .mapPartitions { it =>
        val kb = Corpus.kb(cfg) // regenerated per task; KB is a small dim
        it.map(i => Corpus.doc(cfg, kb, i))
      }
  }

  def docsDF(spark: SparkSession, cfg: Corpus.Config): DataFrame =
    docsDS(spark, cfg).toDF()

  def ment2entDF(spark: SparkSession, cfg: Corpus.Config): DataFrame = {
    import spark.implicits._
    Corpus.kb(cfg).ment2ent.toDF()
  }

  def avpairDF(spark: SparkSession, cfg: Corpus.Config): DataFrame = {
    import spark.implicits._
    Corpus.kb(cfg).avpair.toDF()
  }
}
