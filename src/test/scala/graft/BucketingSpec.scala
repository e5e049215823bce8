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

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    Bucketing.writeBucketed(
      (0L until 100L).map(i => (i, i % 7)).toDF("mid", "tag"),
      "b_other", BucketSpec("mid", 2))
    val j = Bucketing.readBucketed(spark, "b_blogs")
      .join(Bucketing.readBucketed(spark, "b_other"), "mid")
    assert(j.count() === 100) // still correct, just not exchange-free
  }
}
