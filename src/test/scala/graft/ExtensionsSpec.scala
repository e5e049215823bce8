package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the native codec expressions resolve from SQL and stay
  * out of the UDF path (no ScalaUDF in the plan). */
class ExtensionsSpec extends AnyFunSuite {

  test("encode_mid/decode_mid resolve as native SQL functions via extensions") {
    // ensure the shared context exists, then create a FRESH session with
    // the extensions conf (getOrCreate would silently reuse the shared
    // session and skip extension injection); never stop() — that would
    // kill the JVM-shared SparkContext under the other suites
    val shared = TestSpark.spark
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a STATIC conf — honored when the
      // SparkContext is created (spark-submit --conf); over an existing
      // test context the programmatic builder hook is the equivalent
      val spark = SparkSession.builder()
        .withExtensions(new graft.plans.GraftExtensions()(_))
        .getOrCreate()
      assert(spark ne shared)
      val row = spark.sql(
        "SELECT encode_mid('4418719168191891') AS c, " +
          "decode_mid(encode_mid('4418719168191891')) AS back")
      val r = row.collect()(0)
      assert(r.getString(1) === "4418719168191891")
      assert(r.getString(0).length === 9) // 1 + 4 + 4 coded segments
      val plan = row.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), s"codec fell back to a UDF:\n$plan")

      // the ANN natives resolve from SQL too, same values as the column API
      // — written with DECIMAL literals (the natural SQL spelling): the
      // implicit-cast input types must coerce them, not crash at runtime
      val ann = spark.sql(
        "SELECT round(cosine_sim(array(1.0, 0.0), array(1.0, 1.0)), 6) AS c, " +
          "sign_bucket(array(1.0, 0.5, -2.0), 8) AS b").collect()(0)
      assert(math.abs(ann.getDouble(0) - 0.707107) < 1e-6)
      import org.apache.spark.sql.functions._
      val viaCol = spark.range(1)
        .select(graft.datapipe.Similarity.signBucket(
          array(lit(1.0), lit(0.5), lit(-2.0)), 8).as("b"))
        .collect()(0).getLong(0)
      assert(ann.getLong(1) === viaCol)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
