package graft

import graft.core.Bucketing
import graft.datapipe.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose q_fuzzy_incremental's wall (DB setup, per-commit
  * sub-steps) at the bench shape — not part of the driver contract. */
object FuzzProbe {
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
      println(f"[fz] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      time("dbSetup") {
        spark.sql("DROP DATABASE IF EXISTS graft_fzp CASCADE")
        val wh = java.nio.file.Files.createTempDirectory("fzp-wh")
        java.nio.file.Files.delete(wh)
        spark.sql(s"CREATE DATABASE graft_fzp LOCATION '${wh.toString}'")
      }
      val spec = Bucketing.BucketSpec("skey", 8)
      // inline replica of incrementalFuzzyCommit with per-phase timing
      def commit(batch: org.apache.spark.sql.DataFrame, tag: String)
          : org.apache.spark.sql.DataFrame = {
        val sigTable = "graft_fzp.fuzzy_sigs"
        val numHashes = 8; val bands = 4; val w = 3
        val threshold = 0.7; val maxBucket = 64
        val sigs = time(s"$tag.sigs")(
          Dedup.minhashSigsMd5(batch, "doc_id", "text", numHashes, w)
            .localCheckpoint())
        val bnd = Dedup.bandsOfSigs(sigs, numHashes, bands)
        val skeyed = bnd.select(col("id"),
          md5(concat_ws("|", col("band").cast("string"), col("key"))).as("skey"))
        val slotAgreement = (a: org.apache.spark.sql.Column,
                             b: org.apache.spark.sql.Column) =>
          aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / numHashes
        val storeExists = spark.catalog.tableExists(sigTable)
        val fresh = time(s"$tag.screen")(
          if (storeExists) {
            val store = spark.table(sigTable)
            val okStore = store.groupBy("skey")
              .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucket)
              .select("skey")
            val okBatch = skeyed.groupBy("skey")
              .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucket)
              .select("skey")
            val cand = skeyed.join(okBatch, Seq("skey"))
              .join(store.join(okStore, Seq("skey"))
                .select(col("skey"), col("id").as("kept_id"),
                  col("sig").as("kept_sig")), Seq("skey"))
              .select(col("id"), col("kept_id"), col("kept_sig"))
              .distinct()
            val hits = cand.join(sigs, Seq("id"))
              .filter(slotAgreement(col("sig"), col("kept_sig")) >= threshold)
              .select("id").distinct()
            sigs.select("id").join(hits, Seq("id"), "left_anti")
          } else sigs.select("id"))
        val verified = time(s"$tag.verify")(
          Dedup.minhashEstimate(
            Dedup.lshCandidates(bnd.join(fresh, Seq("id"), "left_semi"), maxBucket),
            sigs)
          .filter(col("est_jaccard") >= threshold)
          .select("id1", "id2"))
        val dropped = time(s"$tag.cluster")(
          Dedup.dedupClusters(verified, driverThreshold = 2000000L)
            .filter(col("id") =!= col("keep_id")).select("id"))
        val survivors = time(s"$tag.surv_ckpt")(
          fresh.join(dropped, Seq("id"), "left_anti").localCheckpoint())
        time(s"$tag.append")(
          skeyed.join(survivors, Seq("id"), "left_semi")
            .join(sigs, Seq("id"))
            .select(col("skey"), col("id"), col("sig"), lit(-1L).as("batch"))
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .bucketBy(spec.buckets, spec.key).sortBy(spec.key)
            .format("parquet").saveAsTable(sigTable))
        survivors
      }
      val s1 = time("commit1")(commit(docs.filter(col("doc_id") < 400), "c1"))
      val s2 = time("commit2")(commit(docs.filter(col("doc_id") >= 400), "c2"))
      time("union+noop")(
        s1.select(lit(0L).as("epoch"), col("id").as("doc_id"))
          .unionAll(s2.select(lit(1L).as("epoch"), col("id").as("doc_id")))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
