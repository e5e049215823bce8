package graft

import graft.core.Bucketing
import graft.core.Bucketing.BucketSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join contract: two tables written with the same bucket
  * spec join with ZERO shuffle — the 100 TB layout lever for the engine's
  * repeated key joins (triples ⋈ canon_map, blogs ⋈ parents). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val spec = BucketSpec("mid", 4)

  test("same-spec bucketed tables join with no Exchange; results exact") {
    val blogs = (0L until 500L).map(i => (i, s"content-$i")).toDF("mid", "content")
    val stats = (0L until 500L by 2).map(i => (i, i * 10)).toDF("mid", "reposts")
    Bucketing.writeBucketed(blogs, "b_blogs", spec)
    Bucketing.writeBucketed(stats, "b_stats", spec)

    // at test scale the planner would rather broadcast the 500-row side;
    // disable that so the plan is the SortMergeJoin the layout targets —
    // at 100 TB neither side broadcasts and THIS is the plan that runs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = Bucketing.colocatedJoin(spark, "b_blogs", "b_stats", spec)
        j.collect() // materialize the AQE final plan
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"co-located join still shuffles:\n$plan")
    assert(joined.count() === 250)
    // correctness against the plain (shuffled) join
    val plain = blogs.join(stats, "mid")
    assert(joined.select("mid", "content", "reposts").except(
      plain.select("mid", "content", "reposts")).isEmpty)
  }

  test("bucket-pruned aggregation avoids the exchange too") {
    val agg = Bucketing.readBucketed(spark, "b_blogs")
      .groupBy("mid").agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on the bucket key still shuffles:\n$plan")
  }

  test("q_bucketed_join is hermetic: back-to-back runs on one machine both succeed") {
    // round-2 regression: a FIXED warehouse location threw
    // LOCATION_ALREADY_EXISTS on any rerun; the query must own per-run state
    val sf = "/root/testdata/sf0.001"
    val r1 = SparkEntry.queries("q_bucketed_join")(spark, sf).collect()
    val r2 = SparkEntry.queries("q_bucketed_join")(spark, sf).collect()
    assert(r1.nonEmpty)
    assert(r1.map(_.toString).sorted.toSeq === r2.map(_.toString).sorted.toSeq)
  }

  test("compact: append-grown store collapses to one file per bucket, values and plan intact") {
    import org.apache.spark.sql.functions._
    val tbl = "b_compact_store"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val cspec = BucketSpec("mid", 4)
    // five daily appends — each lays its own file set into every bucket
    (0 until 5).foreach { day =>
      (0L until 200L).map(i => (day * 1000L + i, s"d$day"))
        .toDF("mid", "v").write
        .mode(org.apache.spark.sql.SaveMode.Append)
        .bucketBy(cspec.buckets, cspec.key).sortBy(cspec.key)
        .format("parquet").saveAsTable(tbl)
    }
    def dataFiles(t: String): Int = {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t")
        .filter(col("col_name") === "Location")
        .select("data_type").as[String].head().stripPrefix("file:")
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(loc))
      try walk.iterator().asScala
        .count(p => p.getFileName.toString.startsWith("part-"))
      finally walk.close()
    }
    val before = spark.table(tbl).as[(Long, String)].collect().sorted.toSeq
    val filesBefore = dataFiles(tbl)
    assert(filesBefore >= 5 * cspec.buckets) // fragmentation is real
    Bucketing.compact(spark, tbl, cspec)
    assert(dataFiles(tbl) === cspec.buckets) // one file per bucket
    assert(spark.table(tbl).as[(Long, String)].collect().sorted.toSeq === before)
    // bucket metadata survived the swap: grouping on the key still plans
    // with zero Exchange
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table(tbl).groupBy("mid").agg(count(lit(1)))
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!p.contains("Exchange"),
        s"compacted store lost its bucket layout:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    Bucketing.writeBucketed(
      (0L until 100L).map(i => (i, i % 7)).toDF("mid", "tag"),
      "b_other", BucketSpec("mid", 2))
    val j = Bucketing.readBucketed(spark, "b_blogs")
      .join(Bucketing.readBucketed(spark, "b_other"), "mid")
    assert(j.count() === 100) // still correct, just not exchange-free
  }
}
